package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string — the compression-ratio quality
  * signal (the Gopher-family repetition heuristic: highly compressible
  * text is boilerplate/repetition, nearly incompressible text is noise;
  * natural prose sits between). One codegen'd pass per row over the
  * UTF-8 bytes at a FIXED compression level, so the signal is a pure
  * function of the text: zlib's output for (input, level, strategy) is
  * deterministic on a JVM, and every produced stream is VERIFIED by an
  * inflate round-trip before the size is returned — a mismatch yields -1
  * instead of a silently wrong signal (the fail-closed convention;
  * graded as a violations contract, q172, since no SQL engine exposes a
  * bit-compatible deflate). Ratio consumers should divide by the UTF-8
  * BYTE length (also returned by [[DeflateSize.byteLen]]-style length
  * expressions), not the char length.
  *
  * Scale: narrow, no shuffle, no join; the Deflater/Inflater pair is a
  * THREAD-LOCAL reused via `reset()` — one pair per executor thread for
  * the executor lifetime (a few hundred KB of native memory per thread,
  * bounded), instead of two native allocations plus two frees per row on
  * the quality-signal hot path. reset() preserves the constructor-pinned
  * level, and a call that aborts mid-stream leaves the codecs dirty only
  * until the next call's reset() — no state leaks between rows. */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"DeflateSize expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    DeflateSize.size(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.DeflateSize.size($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {

  def apply(c: Column): Column =
    GraftColumnBridge.column(DeflateSize(GraftColumnBridge.expression(c)))

  /** The pinned compression level — part of the signal's identity (a
    * level change re-scores every document; ship a new column, not a
    * silent drift). */
  val Level = 6

  /** One codec pair per executor thread, reset per row. initialValue
    * pins the level at construction; reset() keeps it. These are never
    * end()ed — the pool is thread-count-bounded and dies with the JVM. */
  private val codecs =
    new ThreadLocal[(java.util.zip.Deflater, java.util.zip.Inflater)] {
      override def initialValue() =
        (new java.util.zip.Deflater(Level), new java.util.zip.Inflater())
    }

  /** Shared eval/codegen core: deflate the UTF-8 bytes at [[Level]],
    * verify by inflate round-trip, return the compressed byte count —
    * or -1 on any round-trip mismatch (fail closed, never a wrong
    * signal). Empty input deflates to the (small, constant) empty
    * stream. */
  def size(s: UTF8String): Long = {
    val bytes = s.getBytes
    val (deflater, inflater) = codecs.get()
    deflater.reset()
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
    deflater.setInput(bytes)
    deflater.finish()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      out.write(buf, 0, n)
    }
    val compressed = out.toByteArray
    // round-trip verification: the signal must describe EXACTLY the input
    inflater.reset()
    try {
      inflater.setInput(compressed)
      val back = new java.io.ByteArrayOutputStream(bytes.length + 32)
      while (!inflater.finished()) {
        val n = inflater.inflate(buf)
        if (n == 0 && inflater.needsInput()) return -1L // truncated stream
        back.write(buf, 0, n)
      }
      if (java.util.Arrays.equals(back.toByteArray, bytes)) compressed.length.toLong
      else -1L
    } catch {
      case _: java.util.zip.DataFormatException => -1L
    }
  }
}
