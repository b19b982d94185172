package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The POSITIONS of the engine's tokens — `array<struct<start, end>>`
  * [start, end) CODE-POINT spans of every `[a-zA-Z0-9]+` run (the
  * [[graft.text.TextAnalysis]] token alphabet, matched case-blind on
  * the ORIGINAL text so offsets refer to the string the caller holds;
  * Java lowercasing is not length-preserving for every code point, so
  * a lowercase-then-match would shift offsets). Built-in
  * `regexp_extract_all` returns the matched STRINGS only — position
  * recovery is what the SFT family needs to translate character-level
  * loss spans ([[graft.text.Chat.assistantSpans]]) into TOKEN-level
  * masks, and what window/chunk builders need to cut text at token
  * boundaries.
  *
  * Code-point units match the span family's contract (Spark
  * `length`/`substring` and Python `str` both count code points), so
  * `span_start <= start && end <= span_end` is the exact
  * "token inside span" test with no unit conversion.
  *
  * Scale: one codegen'd pass per row, no regex machinery at all (the
  * alphabet is three ASCII ranges — a hand loop beats a matcher and
  * allocates only the output), narrow, zero shuffle. NULL in → NULL
  * out. */
case class TokenSpans(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenSpans.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"TokenSpans expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    TokenSpans.spans(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.TokenSpans.spans($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSpans {

  def apply(c: Column): Column =
    GraftColumnBridge.column(TokenSpans(GraftColumnBridge.expression(c)))

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false))), containsNull = false)

  /** Classification matches [[graft.text.TextAnalysis]]'s
    * lower-then-[a-z0-9] counter per CODE POINT: `Character.toLowerCase`
    * maps 1:1 oddities like U+212A KELVIN SIGN → 'k' the same way
    * String lowercasing does, so counts agree wherever lowercasing is
    * LENGTH-PRESERVING. The handful of 1:N special casings (U+0130 İ →
    * 'i' + combining dot) cannot agree positionally with any
    * offset-preserving tokenizer — there this side counts the İ run as
    * one token where the string-lowercase counter may split it; the
    * offsets (the whole point of this expression) stay correct for the
    * ORIGINAL text either way. */
  private def isToken(cp: Int): Boolean = {
    val l = Character.toLowerCase(cp)
    (l >= 'a' && l <= 'z') || (l >= '0' && l <= '9')
  }

  /** Shared eval/codegen core: one walk over the code points,
    * accumulating maximal token runs. Supplementary-plane code points
    * advance the CHAR cursor by two but the code-point cursor by one —
    * which is the whole reason this counts code points itself instead
    * of using char indexes. */
  def spans(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0   // UTF-16 char index (iteration)
    var cp = 0L // code-point index (output unit)
    var runStart = -1L
    while (i < str.length) {
      val c = str.codePointAt(i)
      if (isToken(c)) {
        if (runStart < 0) runStart = cp
      } else if (runStart >= 0) {
        out += InternalRow(runStart, cp)
        runStart = -1L
      }
      i += Character.charCount(c)
      cp += 1
    }
    if (runStart >= 0) out += InternalRow(runStart, cp)
    new GenericArrayData(out.toArray)
  }
}
