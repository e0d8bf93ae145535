package graft.catalog

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Multi-catalog isolation — the reference's defining capability
  * (V2ExternalCatalog.scala:55-83 builds an isolated per-catalog conf so
  * several HMS-backed catalogs coexist in one session). Ours: any number
  * of `GraftCatalog`s, each with its own warehouse, fully independent
  * namespaces/tables under one SparkSession. */
class MultiCatalogSpec extends AnyFunSuite with SparkFixture {

  private def registerCatalog(name: String): Unit = {
    val wh = Files.createTempDirectory(s"graft-$name-wh").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  test("two catalogs with separate warehouses hold same-named tables independently") {
    import spark.implicits._
    registerCatalog("iso_a")
    registerCatalog("iso_b")
    for (c <- Seq("iso_a", "iso_b")) {
      spark.sql(s"CREATE NAMESPACE $c.db")
      spark.sql(s"CREATE TABLE $c.db.t (id BIGINT, tag STRING) USING parquet")
    }
    Seq((1L, "a")).toDF("id", "tag").writeTo("iso_a.db.t").append()
    Seq((2L, "b"), (3L, "b")).toDF("id", "tag").writeTo("iso_b.db.t").append()

    assert(spark.table("iso_a.db.t").collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(spark.table("iso_b.db.t").collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))

    // dropping in one catalog must not affect the other
    spark.sql("DROP TABLE iso_a.db.t")
    assert(spark.sql("SHOW TABLES IN iso_b.db").count() === 1)
    assert(spark.table("iso_b.db.t").count() === 2)
    // cross-catalog join resolves both identifiers in one plan
    spark.sql("CREATE TABLE iso_a.db.t2 (id BIGINT) USING parquet")
    Seq(2L).toDF("id").writeTo("iso_a.db.t2").append()
    val joined = spark.sql(
      "SELECT b.id, b.tag FROM iso_a.db.t2 a JOIN iso_b.db.t b ON a.id = b.id")
    assert(joined.collect().map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "b")))
  }

  test("per-catalog defaultProvider option is honored in isolation") {
    registerCatalog("iso_csv")
    spark.conf.set("spark.sql.catalog.iso_csv.defaultProvider", "csv")
    spark.sql("CREATE NAMESPACE iso_csv.db")
    spark.sql("CREATE TABLE iso_csv.db.t (id BIGINT) ")
    val cat = spark.sessionState.catalogManager.catalog("iso_csv")
      .asInstanceOf[GraftCatalog]
    assert(cat.metaStore.loadTable("db", "t").provider === "csv")
  }
}
