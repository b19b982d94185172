package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** 64-bit SimHash over pre-hashed tokens: bit j of the result = sign of the
  * sum over token hashes of ±1 according to bit j of the hash. Output is the
  * 64 sign bits as array<int> (packing into one long would trip ANSI
  * overflow on the top bit, and the bit array feeds Hamming distance
  * directly).
  *
  * One codegen'd pass: 64 int counters updated per token — vs the
  * higher-order-function formulation which re-walks the token array once per
  * bit position, interpreted. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SimHash64 expects array<bigint> (pre-hashed tokens), got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < xs.numElements()) {
      val h = xs.getLong(i)
      var j = 0
      while (j < 64) { counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      i += 1
    }
    val bits = new Array[Int](64)
    var j = 0
    while (j < 64) { bits(j) = if (counts(j) > 0) 1 else 0; j += 1 }
    new GenericArrayData(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts"); val bits = ctx.freshName("bits")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val h = ctx.freshName("h")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $counts[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |int[] $bits = new int[64];
         |for (int $j = 0; $j < 64; $j++) { $bits[$j] = $counts[$j] > 0 ? 1 : 0; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bits);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))
}

/** SimHash64 packed into ONE long (bit j = sign bit j). Safe to build with
  * bit-ops inside the expression (no ANSI arithmetic overflow — the
  * arithmetic 2^63 formulation is what the array variant avoids); feeds the
  * builtin codegen'd `bit_count(a ^ b)` Hamming distance directly, so
  * banded near-dup mining carries an 8-byte signature instead of a 64-slot
  * array through its joins. */
case class SimHashPacked64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SimHashPacked64 expects array<bigint> (pre-hashed tokens), got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < xs.numElements()) {
      val h = xs.getLong(i)
      var j = 0
      while (j < 64) { counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val h = ctx.freshName("h")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $counts[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashPacked64 {
  def apply(c: Column): Column =
    GraftColumnBridge.column(SimHashPacked64(GraftColumnBridge.expression(c)))
}
