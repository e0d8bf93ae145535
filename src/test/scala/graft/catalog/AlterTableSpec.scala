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

  // --- populated-table evolution ladder (round 20): WITHOUT field ids
  // (external parquet adopting foreign files, non-parquet providers)
  // data files resolve columns BY NAME, so rename-over-data and
  // re-ADD-of-a-dropped-name would silently corrupt history — both must
  // refuse loudly, while the safe evolutions (ADD new name; DROP;
  // everything on an empty table) keep working. MANAGED parquet tables
  // carry field ids from CREATE and these evolutions just WORK —
  // gated in FieldIdSpec.

  /** An EXTERNAL parquet table adopting foreign (id-less) files. */
  private def externalTable(name: String, seed: Boolean): String = {
    import spark.implicits._
    GraftBootstrap.ensure(spark, sf0001)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
    val t = s"$ns.$name"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val dir = java.nio.file.Files.createTempDirectory(s"alt_$name").toString
    if (seed)
      Seq((1L, 42.0), (2L, 43.0)).toDF("id", "score")
        .write.mode("overwrite").parquet(dir)
    spark.sql(s"CREATE TABLE $t (id BIGINT, score DOUBLE) USING parquet " +
      s"LOCATION '$dir'")
    t
  }

  test("RENAME COLUMN over existing id-less data refuses (history would read null)") {
    import spark.implicits._
    val t = externalTable("t_ren_data", seed = true)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN score TO grade"))
    assert(e.getMessage.toLowerCase.contains("rename"), e.getMessage)
    // the refusal preserved both schema and values
    val rows = spark.table(t).orderBy($"id")
      .selectExpr("score").collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(42.0, 43.0))
  }

  test("DROP then re-ADD of the same name over id-less data refuses (values would resurrect)") {
    val t = externalTable("t_readd", seed = true)
    spark.sql(s"ALTER TABLE $t DROP COLUMN score")
    assert(!spark.table(t).schema.fieldNames.contains("score"))
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD COLUMN score DOUBLE"))
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    // RENAME-to the dropped name is the same physical landing — refused too
    spark.sql(s"ALTER TABLE $t ADD COLUMN quality DOUBLE")
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN quality TO score"))
    assert(e2.getMessage.contains("resurrect"), e2.getMessage)
    // a FRESH name over the same data stays fine and reads null history
    spark.sql(s"ALTER TABLE $t ADD COLUMN score2 DOUBLE")
    assert(spark.table(t).filter("score2 IS NULL").count() === 2)
    // the ledger survives unrelated ALTERs (carried through the
    // reserved-prop strip) — the refusal must still fire afterwards
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('note' = 'x')")
    intercept[Exception](spark.sql(s"ALTER TABLE $t ADD COLUMN score DOUBLE"))
  }

  test("same-statement DROP + re-ADD is REPLACE COLUMNS retention, not resurrection") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    // `ALTER TABLE ... REPLACE COLUMNS` arrives as [DeleteColumn(each
    // old), AddColumn(each new)] in ONE alterTable — a retained name
    // never leaves the schema, so its values staying visible is the
    // statement's MEANING (retention), and the name must NOT enter the
    // dropped-column ledger (which would make every later add/rename of
    // the live column refuse spuriously)
    val t = externalTable("t_onestmt", seed = true)
    val cat = spark.sessionState.catalogManager
      .catalog(GraftBootstrap.CatalogName)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    cat.alterTable(
      Identifier.of(Array(ns.split("\\.")(1)), "t_onestmt"),
      TableChange.deleteColumn(Array("score"), false),
      TableChange.addColumn(Array("score"),
        org.apache.spark.sql.types.DoubleType))
    assert(spark.table(t).selectExpr("score").collect()
      .map(_.getDouble(0)).sorted.toSeq === Seq(42.0, 43.0),
      "retained column keeps its values")
    val m = cat.asInstanceOf[GraftCatalog]
      .metaStore.loadTable(ns.split("\\.")(1), "t_onestmt")
    assert(GraftCatalog.droppedColumns(m.properties).isEmpty,
      "a retained name must not pollute the ledger")
    // CROSS-statement drop + re-add stays the refused resurrection
    spark.sql(s"ALTER TABLE $t DROP COLUMN score")
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD COLUMN score DOUBLE"))
    assert(e.getMessage.contains("resurrect"), e.getMessage)
  }

  test("dropped-column ledger is reserved: never user-settable or visible") {
    val t = freshTable("t_ledger")
    intercept[Exception](spark.sql(
      s"""ALTER TABLE $t SET TBLPROPERTIES ('graft.schema.dropped' = '["id"]')"""))
    intercept[Exception](spark.sql(
      s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.schema.dropped')"))
    intercept[Exception](spark.sql(
      s"""CREATE TABLE $ns.t_ledger_create (id BIGINT) USING parquet
         | TBLPROPERTIES ('graft.schema.dropped' = '["id"]')""".stripMargin))
    val props = spark.sql(s"SHOW TBLPROPERTIES $t").collect().map(_.getString(0))
    assert(!props.contains("graft.schema.dropped"))
  }

  test("rename/drop/re-add stay allowed while the table has no data and no lineage") {
    val t = freshTable("t_empty_evo")
    spark.sql(s"ALTER TABLE $t ADD COLUMN score DOUBLE")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN score TO grade")
    spark.sql(s"ALTER TABLE $t DROP COLUMN grade")
    // empty + no lineage: nothing physical to resurrect — re-add is fine
    spark.sql(s"ALTER TABLE $t ADD COLUMN grade DOUBLE")
    assert(spark.table(t).schema.fieldNames.contains("grade"))
  }

  test("RENAME refuses on an emptied id-less table that still has restorable lineage") {
    import spark.implicits._
    // managed CSV: no field ids (non-parquet), DELETE retires files —
    // the pre-delete snapshot could be rolled back, so rename must refuse
    GraftBootstrap.ensure(spark, sf0001)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
    val t = s"$ns.t_lineage_evo"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, p STRING) USING csv PARTITIONED BY (p)")
    Seq((1L, "x")).toDF("id", "p").writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE p = 'x'")
    assert(spark.table(t).count() === 0)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN id TO docid"))
    assert(e.getMessage.toLowerCase.contains("rename"), e.getMessage)
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
