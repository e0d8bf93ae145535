package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd per-query ADC table: for each sub-space j and codebook
  * entry c, the left-to-right dot of the query vector's slice j with
  * book(j)(c) — bit-identical to the m × ksub
  * `dot(slice(qv, start, len), lit(cv))` expression grid it replaces
  * ([[PqAssign]]'s compile-cost argument applied to the query side:
  * the grid is m·ksub ArrayDot + slice instances, Janino-compiled per
  * query for a frame of a few probe rows). Output: array(m) of
  * array(ksub) of double. Null input → null; elements assumed non-null
  * (the `normalized` frame guarantees it). */
case class PqSubDots(child: Expression, books: Seq[Seq[Seq[Double]]],
    slices: Seq[(Int, Int)]) extends UnaryExpression {

  require(books.nonEmpty && books.length == slices.length,
    s"books (${books.length}) and slices (${slices.length}) must align, non-empty")

  private lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  private lazy val starts0: Array[Int] = slices.map(_._1 - 1).toArray
  private lazy val lens: Array[Int] = slices.map(_._2).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${t.sql}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = bookArr.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val book = bookArr(s)
      val off = starts0(s)
      val len = lens(s)
      val dots = new Array[Double](book.length)
      var cid = 0
      while (cid < book.length) {
        val cv = book(cid)
        val n = math.min(math.max(v.numElements() - off, 0), math.min(len, cv.length))
        var d = 0.0
        var i = 0
        while (i < n) { d += v.getDouble(off + i) * cv(i); i += 1 }
        dots(cid) = d
        cid += 1
      }
      out(s) = new GenericArrayData(dots)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val booksRef = ctx.addReferenceObj("pqBooks", bookArr, "double[][][]")
      val startsRef = ctx.addReferenceObj("pqStarts", starts0, "int[]")
      val lensRef = ctx.addReferenceObj("pqLens", lens, "int[]")
      val m = bookArr.length
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val book = ctx.freshName("book")
      val off = ctx.freshName("off")
      val len = ctx.freshName("len")
      val dots = ctx.freshName("dots")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"""
         |Object[] $out = new Object[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double[][] $book = $booksRef[$s];
         |  int $off = $startsRef[$s];
         |  int $len = $lensRef[$s];
         |  double[] $dots = new double[$book.length];
         |  for (int $cid = 0; $cid < $book.length; $cid++) {
         |    double[] $cv = $book[$cid];
         |    int $n = java.lang.Math.min(
         |      java.lang.Math.max($a.numElements() - $off, 0),
         |      java.lang.Math.min($len, $cv.length));
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $d += $a.getDouble($off + $i) * $cv[$i];
         |    }
         |    $dots[$cid] = $d;
         |  }
         |  $out[$s] = new $gad($dots);
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqSubDots =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_sub_dots"
}
