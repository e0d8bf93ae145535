package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md): TPC-H-ish star schema + `events` + LLM-pipeline tables.
  *
  * Timestamp normalization: the files store naive (no-UTC-adjust)
  * timestamps — `timestamp[ms]` for the TPC-H dates and `timestamp[ns]`
  * for `events.ts`. Spark has no nanosecond timestamp, so we read nanos
  * as a long (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
  * microseconds — exactly what DuckDB's ns→µs read does — then present
  * every time column as TIMESTAMP_NTZ so round-tripped parquet stays
  * naive and hash-comparable with the DuckDB oracle.
  *
  * Scale posture: these are plain parquet scans — Spark's vectorized
  * reader, column pruning and filter pushdown apply. At cluster scale the
  * same tables would be directories of many files; nothing here assumes a
  * single file.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Dynamic SQL confs; set here so any caller-provided session works.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case LongType if name == "events" && f.name == "ts" =>
          // nanos → micros (floor), matching DuckDB's ns→µs truncation
          df.withColumn(f.name,
            expr(s"timestamp_micros(${f.name} DIV 1000)").cast(TimestampNTZType))
        case TimestampType =>
          df.withColumn(f.name, col(f.name).cast(TimestampNTZType))
        case _ => df
      }
    }
  }

  /** Register every table as a temp view so SQL-form queries (GROUPING
    * SETS, correlated subqueries, CTEs) can run over the same data. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
