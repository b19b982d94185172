package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the text
  * canonicalization step that belongs BEFORE every hash in a corpus
  * pipeline: "é" as U+00E9 and as "e"+U+0301 are the same text to a reader
  * but different bytes to md5/xxhash/minhash, so un-normalized corpora
  * silently under-deduplicate (and fingerprint dashboards split one
  * document family into several). The reference copies strings byte-wise
  * and never normalizes (its corpora are DB rows, not web text); this is
  * part of the training-data extension surface.
  *
  * Same packaging as [[JsonRepair]]: the body is compiled Scala behind a
  * static forwarder (java.text.Normalizer ships with the JDK — no new
  * dependency), and the expression participates in whole-stage codegen, so
  * there is no UDF wrapper or encoder roundtrip per row. The dominant
  * already-normalized case takes an allocation-free `isNormalized` fast
  * path and returns the INPUT UTF8String untouched.
  */
object Normalize {

  /** Call target for eval and generated code (static forwarder). */
  def nfcUTF8(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }

  /** Column form: NFC-normalize a string column (NULL in -> NULL out). */
  def nfc(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))

  /** Call target for [[StripAccents]] eval and generated code. */
  def stripAccentsUTF8(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val str = s.toString
      // fast path: a string with no char above 0x7F can carry no accent
      var i = 0
      var ascii = true
      while (ascii && i < str.length) { ascii = str.charAt(i) < 0x80; i += 1 }
      if (ascii) s
      else {
        val decomposed = Normalizer.normalize(str, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(decomposed.length)
        var j = 0
        while (j < decomposed.length) {
          val cp = decomposed.codePointAt(j)
          if (Character.getType(cp) != Character.NON_SPACING_MARK)
            sb.appendCodePoint(cp)
          j += Character.charCount(cp)
        }
        UTF8String.fromString(
          Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
      }
    }

  /** Column form: strip accents (NULL in -> NULL out). */
  def stripAccents(c: Column): Column =
    GraftColumnBridge.column(StripAccents(GraftColumnBridge.expression(c)))
}

/** Codegen'd NFC normalization: string -> canonically composed string. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"NfcNormalize expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    Normalize.nfcUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Normalize.nfcUTF8($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd accent stripping: NFD-decompose, drop every combining mark
  * (Unicode category Mn), re-compose NFC — "café" -> "cafe", "señor" ->
  * "senor", while non-decomposable letters (ß, ø) pass through. The
  * search/dedup recall normalization (accent variants of one word hash
  * apart — the [[NfcNormalize]] argument one step further); matches
  * DuckDB's strip_accents on the whole precomposed-Latin range (verified
  * char-for-char on the q174 planted set), so the expression grades
  * cross-engine. ASCII takes an allocation-free fast path returning the
  * input untouched — at 100 TB the overwhelmingly-ASCII corpus pays one
  * isNormalized-style scan per row, not a per-char rebuild. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"StripAccents expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    Normalize.stripAccentsUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Normalize.stripAccentsUTF8($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
