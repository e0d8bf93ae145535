package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.connector.catalog.{CatalogV2Util, TableChange}
import org.apache.spark.sql.types.StructType

/** The one private-API bridge file (SURVEY §7.3 / R21): re-exports the
  * `private[sql]` `CatalogV2Util` helpers for ALTER TABLE semantics —
  * the same technique as the reference's `InternalSqlBridge`
  * (/root/reference/spark-dsv2-common-base/.../InternalSqlBridge.scala:19-77),
  * kept to the minimal surface actually needed.
  */
object GraftSqlBridge {
  def applyPropertiesChanges(
      properties: Map[String, String],
      changes: Seq[TableChange]): Map[String, String] =
    CatalogV2Util.applyPropertiesChanges(properties, changes)

  def applySchemaChanges(
      schema: StructType,
      changes: Seq[TableChange],
      provider: Option[String],
      statementType: String): StructType =
    CatalogV2Util.applySchemaChanges(schema, changes, provider, statementType)

  /** Wrap a raw Catalyst expression as a user-facing Column (the
    * constructor is private[sql] in Spark 4). */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The inverse: unwrap a Column's Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
