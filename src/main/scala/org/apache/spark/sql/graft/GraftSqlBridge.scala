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
/** Optimizer rule: re-resolves `V2TableReference` leaves that survive
  * analysis. Spark 4.1 stores a temp view created over a DSv2 relation
  * as a re-resolvable reference (`ViewHelper.prepareTemporaryViewPlan`),
  * and the analyzer substitutes the live relation on resolution — but
  * `RewriteMergeIntoTable` copies the PRE-substitution source plan into
  * `ReplaceData.groupFilterCondition`, which no analyzer rule revisits
  * (the reference reports itself resolved). The planner then dies with
  * "No plan for TableReference", taking the runtime group-filter
  * subquery — which clones the same leaf — down with it. This rule
  * reloads the referenced table and substitutes the relation, keeping
  * the reference's output attributes (exprIds) intact, so
  * `MERGE INTO ... USING <temp view over a catalog table>` works.
  * Injected declaratively by [[graft.GraftExtensions]] and imperatively
  * by `GraftBootstrap.ensure` (experimental.extraOptimizations — that
  * batch still runs before planning, and the rule rewrites subqueries
  * too, so post-DPP application is equally correct). */
object ResolveStrandedTableReferences
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.V2TableReference
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case r: V2TableReference =>
        r.toRelation(r.catalog.loadTable(r.identifier))
    }
}

/** Re-export of the `private[sql]` streaming-fallback hook: a V2 table
  * extending this is given to the analyzer's RelationResolution, which
  * wraps `v1Table` in a streaming UnresolvedCatalogRelation so
  * `spark.readStream.table(...)` runs through Spark's V1
  * FileStreamSource (the only file micro-batch engine — DSv2 file scans
  * never implement `toMicroBatchStream`). */
trait StreamingV1FallbackTable
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

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
