package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd k-component minhash signature of an `array<long>` of
  * shingle hashes: component i is `min over h of xxhash64(i, h)`,
  * bit-identical to the higher-order formulation
  * `array_min(transform(hs, h => xxhash64(lit(i), h)))` it replaces
  * (including the null-element case, where XxHash64 skips the null and
  * yields the salted seed itself).
  *
  * This is the [[ArrayDot]] decision (SURVEY §7.3) applied to s14's
  * row-local signatures: the HOF form evaluates k interpreted lambdas
  * per row — k array allocations and k·n interpreted expression
  * evaluations — which made the streaming near-dedup's banding
  * projection its dominant cost (13.7 s of the sf0.1 bench). The
  * generated code below is one fused loop over the hash array inside
  * whole-stage codegen: k·n `XXH64.hashLong` calls, zero intermediate
  * allocations.
  *
  * The per-component seed is `XXH64.hashInt(i, 42)` — exactly what
  * `xxhash64(lit(i), …)` folds the INTEGER literal i into before the
  * element hash, so signatures keep matching the Dedup convention
  * (`Dedup.signaturesFromShingles` salts the same way). Empty input
  * yields NULL (callers band only docs with shingles). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"minhash signature size k=$k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // empty input → null

  // One seed per signature component: xxhash64(lit(i: Int), h) hashes the
  // int literal first — hashInt(i, 42) — then the element into that seed.
  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        var i = 0
        while (i < k) { if (seeds(i) < mins(i)) mins(i) = seeds(i); i += 1 }
      } else {
        val h = arr.getLong(j)
        var i = 0
        while (i < k) {
          val v = XXH64.hashLong(h, seeds(i))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val xxh64 = classOf[XXH64].getName
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) {
         |      for (int $i = 0; $i < $k; $i++) {
         |        if ($seedsRef[$i] < $mins[$i]) $mins[$i] = $seedsRef[$i];
         |      }
         |    } else {
         |      long $h = $a.getLong($j);
         |      for (int $i = 0; $i < $k; $i++) {
         |        long $v = $xxh64.hashLong($h, $seedsRef[$i]);
         |        if ($v < $mins[$i]) $mins[$i] = $v;
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}
