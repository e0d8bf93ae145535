package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md): TPC-H-ish star schema + `events` + LLM-pipeline tables.
  *
  * Every load resolves `graft.tpch.<name>` through the DSv2 catalog
  * ([[GraftBootstrap]] registers the fixtures as EXTERNAL tables), so the
  * whole query inventory exercises the engine path: GraftCatalog →
  * GraftTable.newScanBuilder → ParquetScanBuilder → vectorized columnar
  * scan with pushdown/pruning.
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

  /** SPARK_GRAFT_RAW=1 bypasses the catalog (plain spark.read.parquet
    * over the same files) — the baseline side of BASELINE.md's
    * engine-vs-baseline measurement. Default: the DSv2 catalog path.
    * [[graft.Bench]] flips it at runtime to capture BOTH modes in one
    * paired run, so the per-round artifact carries its own denominator. */
  @volatile private var rawMode = sys.env.get("SPARK_GRAFT_RAW").contains("1")

  /** Switch the read path between raw parquet and the catalog. Clears
    * the temp-view cache: views registered under the previous mode
    * resolve to the wrong scan path and would silently mis-attribute
    * timings. */
  private[graft] def setRawMode(on: Boolean): Unit = synchronized {
    if (rawMode != on) { rawMode = on; viewsFor = Set.empty }
  }

  /** int64-nanos → µs-truncated naive timestamp — exactly DuckDB's
    * ns→µs read (shared by the batch loader and the streaming source). */
  private[graft] def nanosToNtz(colName: String): org.apache.spark.sql.Column =
    expr(s"timestamp_micros($colName DIV 1000)").cast(TimestampNTZType)

  /** Normalize a fixture time column to TIMESTAMP_NTZ whatever physical
    * type the parquet stores — int64 nanos (read as long under
    * `nanosAsLong`), instant-adjusted µs, or already-naive µs. The
    * fixture generator has shipped both ns and µs encodings across
    * rounds; keying on the observed dtype instead of the encoding du
    * jour keeps batch and streaming readers correct under either. */
  private[graft] def normalizeTs(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case LongType      => df.withColumn(colName, nanosToNtz(colName))
      case TimestampType => df.withColumn(colName, col(colName).cast(TimestampNTZType))
      case _             => df // already TIMESTAMP_NTZ
    }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = if (rawMode) {
      GraftBootstrap.setSessionConfs(spark)
      spark.read.parquet(s"$sfDir/$name.parquet")
    } else {
      GraftBootstrap.ensure(spark, sfDir)
      spark.table(s"${GraftBootstrap.CatalogName}.${GraftBootstrap.Namespace}.$name")
    }
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case LongType if name == "events" && f.name == "ts" =>
          df.withColumn(f.name, nanosToNtz(f.name))
        case TimestampType =>
          df.withColumn(f.name, col(f.name).cast(TimestampNTZType))
        case _ => df
      }
    }
  }

  @volatile private var viewsFor: Set[(SparkSession, String)] = Set.empty

  /** Register every table as a temp view so SQL-form queries (GROUPING
    * SETS, correlated subqueries, CTEs) can run over the same data.
    * Cached per (session, sfDir) — re-registering ten tables per query
    * call was round 3's q12/q22/q23 overhead. */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    if (viewsFor.contains((spark, sfDir))) return
    synchronized {
      if (viewsFor.contains((spark, sfDir))) return
      all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
      viewsFor = viewsFor.filterNot(_._1 == spark) + ((spark, sfDir))
    }
  }
}
