package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftBootstrap, SparkFixture}

/** ALTER TABLE `TableChange` semantics through SQL (R6): property sets,
  * column add/rename/drop, and the partition-column guard. */
class AlterTableSpec extends AnyFunSuite with SparkFixture {

  private val ns = s"${GraftBootstrap.CatalogName}.alt"

  private def freshTable(name: String): String = {
    GraftBootstrap.ensure(spark, sf0001)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
    val t = s"$ns.$name"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, p STRING) USING parquet PARTITIONED BY (p)")
    t
  }

  test("SET/UNSET TBLPROPERTIES round-trips, reserved props never stored") {
    val t = freshTable("t_props")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('retention' = '30d')")
    val show = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(show.get("retention").contains("30d"))
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('retention')")
    val after = spark.sql(s"SHOW TBLPROPERTIES $t").collect().map(_.getString(0))
    assert(!after.contains("retention"))
    val meta = spark.sessionState.catalogManager
      .catalog(GraftBootstrap.CatalogName).asInstanceOf[GraftCatalog]
      .metaStore.loadTable("alt", "t_props")
    assert(!meta.properties.contains("provider") && !meta.properties.contains("location"))
  }

  test("ADD / RENAME / DROP COLUMN evolve the schema") {
    val t = freshTable("t_cols")
    spark.sql(s"ALTER TABLE $t ADD COLUMN extra DOUBLE")
    assert(spark.table(t).schema.fieldNames.contains("extra"))
    spark.sql(s"ALTER TABLE $t RENAME COLUMN extra TO score")
    assert(spark.table(t).schema.fieldNames.contains("score"))
    spark.sql(s"ALTER TABLE $t DROP COLUMN score")
    assert(!spark.table(t).schema.fieldNames.contains("score"))
  }

  test("ADD COLUMN over existing data: old files read back with nulls in the new column") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val t = freshTable("t_evolve")
    Seq((1L, "x"), (2L, "y")).toDF("id", "p").writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ADD COLUMN score DOUBLE")
    val rows = spark.table(t).orderBy($"id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows.forall(_.isNullAt(2)), "pre-evolution rows must read null for the new column")
    // new writes carry the column; both generations coexist in one scan
    Seq((3L, 0.5, "z")).toDF("id", "score", "p").writeTo(t).append()
    val all = spark.table(t).orderBy($"id").collect()
    assert(all.length === 3)
    assert(all.last.getDouble(2) === 0.5)
    assert(spark.table(t).filter(col("score").isNull).count() === 2)
  }

  test("SET LOCATION is refused, not silently ignored") {
    val t = freshTable("t_loc")
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t SET LOCATION '/somewhere/else'"))
    assert(e.getMessage.contains("location"))
  }

  test("dropping a partition column is refused") {
    val t = freshTable("t_guard")
    intercept[Exception](spark.sql(s"ALTER TABLE $t DROP COLUMN p"))
    assert(spark.table(t).schema.fieldNames.contains("p"))
  }
}
