package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd Count–Min point query: estimated corpus count of a string
  * key under a FIXED, driver-resolved sketch (q87).
  *
  * The sketch arrives as a constructor constant — the same
  * driver-resolved-artifact pattern as q78's PQ codebooks and q66b's
  * target maps: one tiny action materializes the ~100 KB sketch, then
  * the probe is a pure row-local projection (no join against the sketch
  * row, no per-row deserialization — the sketch deserializes once per
  * task via `addReferenceObj`).
  *
  * Hash contract: Spark's `count_min_sketch` aggregate inserts a
  * StringType value as `addBinary(utf8.getBytes)` (CountMinSketchAgg's
  * update — verified against the 4.1.2 bytecode), so the probe calls
  * `estimateCount` with the SAME UTF-8 byte view; a String-typed probe
  * would hash differently and silently return garbage counts.
  *
  * Mirrors the reference's pattern of broadcasting small driver-built
  * state to executors (`HiveFileScan.scala:28-30` broadcasts the merged
  * hadoop conf) — here the state rides the expression itself.
  */
case class CmsCountString(child: Expression, sketchBytes: Array[Byte])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = LongType

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))

  override def nullSafeEval(v: Any): Any =
    sketch.estimateCount(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the EXPRESSION (not the lazy sketch): the reference
    // object is serialized into the codegen'd class, and shipping the
    // compact bytes + one readFrom per task beats shipping the
    // deserialized table-of-longs object graph
    val self = ctx.addReferenceObj("cmsExpr", this, classOf[CmsCountString].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.probe($c.getBytes());")
  }

  /** Called from generated code. */
  def probe(keyUtf8: Array[Byte]): Long = sketch.estimateCount(keyUtf8)

  override protected def withNewChildInternal(newChild: Expression): CmsCountString =
    copy(child = newChild)

  override def prettyName: String = "graft_cms_count"
}
