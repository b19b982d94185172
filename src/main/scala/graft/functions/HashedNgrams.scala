package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** SORTED DISTINCT 64-bit hashes of every n-token window over pre-hashed
  * tokens — the shingle set of the n-gram dedup pipelines, in ONE codegen'd
  * pass (window combine + sort + in-place dedup) instead of the interpreted
  * lambda chain (`transform(sequence(...), i -> xxhash64(element_at...))`)
  * that re-evaluated n element_at calls per window per row.
  *
  * The combiner is a fixed xx/murmur-style mix (rotate-multiply per
  * element, avalanche finalizer) — NOT Spark's xxhash64. That is safe
  * because these hashes are pipeline-internal: banding only needs
  * consistent keys and the exact-Jaccard verifier compares the same hash
  * sets on both sides, so ANY injective-in-practice 64-bit combine yields
  * identical PAIR results (64-bit collision risk ~1e-15, the same accepted
  * everywhere else). Fewer than n tokens -> empty set, mirroring the
  * `when(size >= n, ...) otherwise array()` formulation it replaces.
  * Null elements are rejected at analysis (containsNull must be false) —
  * all producers hash tokens with xxhash64, which never yields null, and
  * getLong on a null slot would silently read 0.
  */
case class HashedNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"HashedNgrams expects array<bigint> with non-null elements " +
            s"(pre-hashed tokens from xxhash64), got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val len = xs.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i < out.length) {
      var acc = -7046029254386353131L // 0x9E3779B97F4A7C15
      var j = 0
      while (j < n) {
        acc = java.lang.Long.rotateLeft((acc ^ xs.getLong(i + j)) * -4417276706812531889L, 31)
        j += 1
      }
      acc ^= (acc >>> 33); acc *= -49064778989728563L
      acc ^= (acc >>> 33); acc *= -4265267296055464877L
      acc ^= (acc >>> 33)
      out(i) = acc
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val w = ctx.freshName("w"); val r = ctx.freshName("r")
      val len = ctx.freshName("len")
      s"""
         |int $len = $a.numElements();
         |if ($len < $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$len - $n + 1];
         |  for (int $i = 0; $i < $out.length; $i++) {
         |    long $acc = -7046029254386353131L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc = Long.rotateLeft(($acc ^ $a.getLong($i + $j)) * -4417276706812531889L, 31);
         |    }
         |    $acc ^= ($acc >>> 33); $acc *= -49064778989728563L;
         |    $acc ^= ($acc >>> 33); $acc *= -4265267296055464877L;
         |    $acc ^= ($acc >>> 33);
         |    $out[$i] = $acc;
         |  }
         |  java.util.Arrays.sort($out);
         |  int $w = 1;
         |  for (int $r = 1; $r < $out.length; $r++) {
         |    if ($out[$r] != $out[$w - 1]) { $out[$w] = $out[$r]; $w++; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($out, $w));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedNgrams {
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.column(HashedNgrams(GraftColumnBridge.expression(c), n))
}
