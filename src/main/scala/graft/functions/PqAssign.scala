package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd product-quantization code assignment: for each of the `m`
  * sub-spaces, the Euclidean-nearest codebook entry of the vector's
  * slice — bit-identical to the per-sub-space
  * `array_sort(array(struct(sqDist(slice, lit(cv)), cid)))` formulation
  * it replaces (left-to-right Σ(a−b)² per candidate, ties to the
  * smaller code id).
  *
  * This is the [[MinHashSig]] decision applied to the PQ encode pass:
  * the expression-tree form inlines m × ksub ArraySqDist instances plus
  * sort machinery — thousands of Janino-compiled expression nodes that
  * made encode the dominant *compile* cost of q78/q78b (execution on the
  * fixture is trivial; the tree is rebuilt and recompiled per query).
  * Here the codebooks ride along as one constant `double[m][ksub][]`
  * reference and the generated code is three nested loops.
  *
  * `slices` are (1-based start, length) per sub-space, exactly
  * [[graft.llm.Similarity.pqSlices]]' convention. Elements are assumed
  * non-null (the `normalized`/residual frames guarantee it — vectors
  * arrive as casts of non-null parquet floats). Null input → null. */
case class PqAssign(child: Expression, books: Seq[Seq[Seq[Double]]],
    slices: Seq[(Int, Int)]) extends UnaryExpression {

  // Seq fields keep case-class VALUE equality (Catalyst compares and
  // canonicalizes expressions by equals; Array fields would compare by
  // reference); the hot loops read these array mirrors.
  private lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  require(books.nonEmpty && books.length == slices.length,
    s"books (${books.length}) and slices (${slices.length}) must align, non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val starts0: Array[Int] = slices.map(_._1 - 1).toArray
  private lazy val lens: Array[Int] = slices.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = bookArr.length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = bookArr(s)
      val off = starts0(s)
      val len = lens(s)
      var bestD = Double.PositiveInfinity
      var bestC = -1
      var cid = 0
      while (cid < book.length) {
        val cv = book(cid)
        val n = math.min(math.max(v.numElements() - off, 0), math.min(len, cv.length))
        var d = 0.0
        var i = 0
        while (i < n) {
          val x = v.getDouble(off + i) - cv(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; bestC = cid }
        cid += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val booksRef = ctx.addReferenceObj("pqBooks", bookArr, "double[][][]")
      val startsRef = ctx.addReferenceObj("pqStarts", starts0, "int[]")
      val lensRef = ctx.addReferenceObj("pqLens", lens, "int[]")
      val m = bookArr.length
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val book = ctx.freshName("book")
      val off = ctx.freshName("off")
      val len = ctx.freshName("len")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double[][] $book = $booksRef[$s];
         |  int $off = $startsRef[$s];
         |  int $len = $lensRef[$s];
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $bestC = -1;
         |  for (int $cid = 0; $cid < $book.length; $cid++) {
         |    double[] $cv = $book[$cid];
         |    int $n = java.lang.Math.min(
         |      java.lang.Math.max($a.numElements() - $off, 0),
         |      java.lang.Math.min($len, $cv.length));
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = $a.getDouble($off + $i) - $cv[$i];
         |      $d += $x * $x;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $bestC = $cid; }
         |  }
         |  $codes[$s] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_assign"
}
