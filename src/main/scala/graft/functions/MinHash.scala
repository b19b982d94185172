package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over pre-hashed shingles in ONE codegen'd pass:
  * sig(i) = min over shingle hashes x of
  * h_i(x) = pmod(pmod(x, P) * (2i+1) + (12345·i + 7), P), P = 2^31 − 1 —
  * BIT-IDENTICAL arithmetic to the higher-order-function formulation it
  * replaces (`transform(sequence(...), i -> array_min(transform(...)))`),
  * whose nested lambdas Spark evaluates INTERPRETED, re-walking the
  * shingle array once per hash function. Here the shingle array is walked
  * once with all `numHashes` minima updated per element in a JIT-compiled
  * loop — the hottest stage of the LSH dedup pipeline.
  *
  * Intermediate `pm·(2i+1) + (12345·i+7)` stays < 2^31 · 2·numHashes —
  * under 2^52 for the required numHashes ≤ 2^20, so no 64-bit overflow;
  * `pm ≥ 0` makes the final `% P` equal to pmod. Empty input mirrors the
  * HOF formulation exactly: `array_min` of an empty array is NULL, so the
  * signature is `numHashes` NULL slots (callers filter empty shingle sets
  * before signing — this path exists only for drop-in parity).
  *
  * Input element nulls are REJECTED at analysis (containsNull must be
  * false): every in-repo producer builds the array from xxhash64, which
  * never yields null elements, and silently reading a null slot as 0
  * (what getLong would do) would break the claimed bit-parity with the
  * HOF form (whose array_min SKIPS nulls).
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= (1 << 20),
    s"numHashes must be in [1, 2^20] (overflow bound), got $numHashes")

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSignature expects array<bigint> with non-null elements " +
            s"(pre-hashed shingles from xxhash64), got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val pm = ((xs.getLong(i) % P) + P) % P
      var k = 0
      while (k < numHashes) {
        val hv = (pm * (2L * k + 1) + (12345L * k + 7)) % P
        if (hv < sig(k)) sig(k) = hv
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig"); val pm = ctx.freshName("pm")
      val i = ctx.freshName("i"); val k = ctx.freshName("k"); val hv = ctx.freshName("hv")
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$numHashes]);
         |} else {
         |  long[] $sig = new long[$numHashes];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    long $pm = (($a.getLong($i) % ${P}L) + ${P}L) % ${P}L;
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      long $hv = ($pm * (2L * $k + 1) + (12345L * $k + 7)) % ${P}L;
         |      if ($hv < $sig[$k]) $sig[$k] = $hv;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(c), numHashes))
}
