package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE word encoding under a FIXED rank-ordered merge table
  * (q85): `word → array<piece>`, applying each rule in rank order as
  * one left-to-right non-overlapping pass — bit-identical to the
  * higher-order `aggregate` fold chain it replaces
  * ([[graft.llm.TextAnalysis.bpeEncode]]'s contract, and the exact
  * fold `bpeMerges` trains with).
  *
  * This is the third expression that earns the custom-`Expression`
  * drop (SURVEY §7.3 decision table; [[ArrayDot]]/[[MinHashSig]] are
  * its siblings): the `merges.length`-deep nested `aggregate` HOF
  * chain allocates an intermediate array per rule per word and
  * evaluates interpreted lambdas per symbol — measured ~150 µs/word on
  * the bench corpus, which made q85 the single most expensive query in
  * the inventory (22.8 s). Here each rule is one tight loop over a
  * reused buffer; the merge table rides the expression as a
  * driver-resolved constant (q78's codebook pattern).
  *
  * Character split matches `split(w, "")`: Java's empty-regex split on
  * the JVM string — the same operation Spark's `StringSplit` performs
  * on `UTF8String`, and the same rule the DuckDB oracle's
  * `string_split(wd, '')` states on the fixture's character set.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  require(merges.nonEmpty, "merges must be non-empty")
  require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "merge sides must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val rules: Array[(String, String)] = merges.toArray

  /** Called from generated code too. */
  def encode(word: UTF8String): ArrayData = {
    var syms: Array[String] = word.toString.split("").filter(_.nonEmpty)
    var k = 0
    while (k < rules.length && syms.length > 1) {
      val l = rules(k)._1
      val r = rules(k)._2
      val lr = l + r
      val out = new Array[String](syms.length)
      var n = 0
      var i = 0
      while (i < syms.length) {
        if (n > 0 && out(n - 1) == l && syms(i) == r) out(n - 1) = lr
        else { out(n) = syms(i); n += 1 }
        i += 1
      }
      if (n < syms.length) syms = java.util.Arrays.copyOf(out, n)
      else syms = out
      k += 1
    }
    new GenericArrayData(syms.map(s => UTF8String.fromString(s): Any))
  }

  override def nullSafeEval(w: Any): Any = encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeExpr", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $self.encode($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_encode"
}
