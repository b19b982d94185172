package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoding in ONE codegen'd pass: for each of the m
  * contiguous `subDim`-dim sub-vectors, the index of the L2-nearest
  * sub-centroid (argmin ||c||² − 2·v_s·c, lowest id on ties) — the
  * codebooks ride into generated code as a reference object instead of
  * m×k inlined struct-comparison expressions (the `least(struct(...))`
  * formulation compiles enormous generated methods and re-reads the slice
  * per centroid). Arithmetic is BIT-IDENTICAL to that formulation: dot
  * products accumulate left-to-right in double (FloatDotProduct's order),
  * centroid self-norms are the same driver-side sums, and strict `<`
  * keeps the lowest centroid id on ties exactly like struct least.
  *
  * `books(s)(cid)` = centroid `cid` of subspace `s`; every subspace must
  * have >= 1 centroid and the vector must have m·subDim elements — the
  * length is ENFORCED per row (an UnsafeArrayData read past numElements
  * returns garbage buffer bytes, so a silent mismatch would yield wrong
  * codes instead of an error).
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]], subDim: Int)
    extends UnaryExpression {

  private val m = books.length

  require(books.nonEmpty && books.forall(_.nonEmpty),
    "PqEncode: every subspace needs at least one centroid — an empty " +
      "codebook would silently emit code 0 for every row")

  @transient private lazy val norm2: Array[Array[Double]] =
    books.map(_.map(_.map(x => x.toDouble * x).sum))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"PqEncode expects array<float>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * subDim) {
      throw new IllegalArgumentException(
        s"PqEncode: vector has ${v.numElements()} elements, expected ${m * subDim} (m=$m x subDim=$subDim)")
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var best = Double.MaxValue
      var bestCid = 0
      var cid = 0
      while (cid < books(s).length) {
        val c = books(s)(cid)
        var dot = 0.0
        var j = 0
        while (j < subDim) { dot += v.getFloat(off + j).toDouble * c(j); j += 1 }
        val d = norm2(s)(cid) - 2.0 * dot
        if (d < best) { best = d; bestCid = cid }
        cid += 1
      }
      codes(s) = bestCid
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    val norm2Ref = ctx.addReferenceObj("pqNorm2", norm2, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes"); val s = ctx.freshName("s")
      val off = ctx.freshName("off"); val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid"); val cid = ctx.freshName("cid")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException(
         |    "PqEncode: vector has " + $a.numElements() +
         |    " elements, expected ${m * subDim} (m=$m x subDim=$subDim)");
         |}
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $off = $s * $subDim;
         |  double $best = Double.MAX_VALUE;
         |  int $bestCid = 0;
         |  for (int $cid = 0; $cid < $booksRef[$s].length; $cid++) {
         |    float[] $c = $booksRef[$s][$cid];
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      $dot += (double) $a.getFloat($off + $j) * (double) $c[$j];
         |    }
         |    double $d = $norm2Ref[$s][$cid] - 2.0 * $dot;
         |    if ($d < $best) { $best = $d; $bestCid = $cid; }
         |  }
         |  $codes[$s] = $bestCid;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(c: Column, books: Array[Array[Array[Float]]], subDim: Int): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(c), books, subDim))
}
