package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftBootstrap, SparkFixture, Tables}

/** The catalog read path must be value-identical to a direct
  * `spark.read.parquet` of the same fixtures — table-level parity implies
  * every declared query stays hash-identical after routing through
  * GraftCatalog/GraftTable. */
class CatalogParitySpec extends AnyFunSuite with SparkFixture {

  private def direct(name: String): DataFrame = {
    GraftBootstrap.setSessionConfs(spark)
    val raw = spark.read.parquet(s"$sf0001/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case LongType if name == "events" && f.name == "ts" =>
          df.withColumn(f.name,
            expr(s"timestamp_micros(${f.name} DIV 1000)").cast(TimestampNTZType))
        case TimestampType => df.withColumn(f.name, col(f.name).cast(TimestampNTZType))
        case _ => df
      }
    }
  }

  Tables.all.foreach { name =>
    test(s"catalog path matches direct parquet read: $name") {
      val viaCatalog = Tables(spark, sf0001, name)
      val viaFiles = direct(name)
      assert(viaCatalog.schema.map(f => (f.name, f.dataType)) ===
        viaFiles.schema.map(f => (f.name, f.dataType)))
      assert(viaCatalog.count() === viaFiles.count())
      assert(viaCatalog.exceptAll(viaFiles).isEmpty)
      assert(viaFiles.exceptAll(viaCatalog).isEmpty)
    }
  }

  test("scan plan pushes filters and prunes columns through the catalog") {
    val df = Tables(spark, sf0001, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(l_orderkey"),
      s"expected pushed filter in plan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("l_extendedprice"),
      s"expected pruned read schema in plan:\n$plan")
  }
}
