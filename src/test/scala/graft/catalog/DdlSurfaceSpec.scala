package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftBootstrap, SparkFixture}

/** The information-schema DDL surface a catalog user touches daily:
  * SHOW NAMESPACES / SHOW TABLES / DESCRIBE, and the error classes for
  * missing objects — all served by the DSv2 interfaces without custom
  * command code. */
class DdlSurfaceSpec extends AnyFunSuite with SparkFixture {

  private def cat = GraftBootstrap.CatalogName

  test("SHOW NAMESPACES / SHOW TABLES list catalog contents") {
    GraftBootstrap.ensure(spark, sf0001)
    val namespaces = spark.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0))
    assert(namespaces.contains(GraftBootstrap.Namespace))
    val tables = spark.sql(s"SHOW TABLES IN $cat.${GraftBootstrap.Namespace}")
      .collect().map(_.getString(1))
    graft.Tables.all.foreach(t => assert(tables.contains(t), s"missing $t"))
  }

  test("DESCRIBE TABLE reports columns and partitioning") {
    GraftBootstrap.ensure(spark, sf0001)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ddl")
    spark.sql(s"DROP TABLE IF EXISTS $cat.ddl.t")
    spark.sql(s"CREATE TABLE $cat.ddl.t (id BIGINT, p STRING) USING parquet PARTITIONED BY (p)")
    val desc = spark.sql(s"DESCRIBE TABLE $cat.ddl.t").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(desc.contains(("id", "bigint")))
    assert(desc.contains(("p", "string")))
    assert(desc.map(_._1).contains("# Partition Information"))
  }

  test("missing objects raise the standard error classes") {
    GraftBootstrap.ensure(spark, sf0001)
    val noTable = intercept[Exception](spark.table(s"$cat.${GraftBootstrap.Namespace}.nope"))
    assert(noTable.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      noTable.getMessage.toLowerCase.contains("cannot be found"))
    val noNs = intercept[Exception](spark.sql(s"SHOW TABLES IN $cat.no_such_db"))
    assert(noNs.getMessage.contains("SCHEMA_NOT_FOUND") ||
      noNs.getMessage.toLowerCase.contains("not found"))
  }
}
