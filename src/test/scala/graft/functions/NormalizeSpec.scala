package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** All accented strings are built from EXPLICIT escapes — a raw "é" in
  * source could be either normalization form depending on the editor, which
  * is precisely the ambiguity the operator exists to remove. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val DecE = "e\u0301"   // e + COMBINING ACUTE (2 codepoints)
  private val NfcE = "\u00e9"    // precomposed U+00E9    (1 codepoint)

  test("nfcUTF8 composes decomposed sequences and is identity on NFC text") {
    import org.apache.spark.unsafe.types.UTF8String
    val dec = UTF8String.fromString(s"caf$DecE")
    assert(Normalize.nfcUTF8(dec).toString === s"caf$NfcE")
    // already-NFC input returns the SAME instance (allocation-free fast path)
    val ok = UTF8String.fromString(s"caf$NfcE")
    assert(Normalize.nfcUTF8(ok) eq ok)
    assert(Normalize.nfcUTF8(null) === null)
    // pure ASCII is trivially NFC
    val ascii = UTF8String.fromString("plain text")
    assert(Normalize.nfcUTF8(ascii) eq ascii)
  }

  test("nfc column composes through codegen, preserves NULLs, shrinks codepoints") {
    val decGrave = "e\u0300" // e + COMBINING GRAVE
    val df = Seq(
      (1L, s"${DecE}l${decGrave}ve"), // 7 codepoints, NFC composes to 5
      (2L, "plain"),
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df.select($"id", Normalize.nfc($"t").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) === "\u00e9l\u00e8ve")
    assert(out(2L) === "plain")
    assert(out(3L) === null)
    val lens = df.filter($"id" === 1L)
      .select(length($"t"), length(Normalize.nfc($"t"))).head
    assert(lens.getInt(0) === 7 && lens.getInt(1) === 5)
  }

  test("graft_nfc SQL function computes the identical composition") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(s"SELECT graft_nfc('$DecE') AS n").head.getString(0)
    assert(r === NfcE)
  }

  test("stripAccents: precomposed + decomposed marks drop, non-decomposables pass, ASCII fast path") {
    val df = Seq(
      (1L, "caf\u00e9 se\u00f1or na\u00efve"), // precomposed
      (2L, "de\u0301ja\u0300 vu"),                 // decomposed combining marks
      (3L, "\u00fcberma\u00df \u00e5land"),   // \u00df survives, \u00fc/\u00e5 strip
      (4L, "plain ascii stays"),
      (5L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df.select($"id", Normalize.stripAccents($"t").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) === "cafe senor naive")
    assert(out(2L) === "deja vu")
    assert(out(3L) === "uberma\u00df aland")
    assert(out(4L) === "plain ascii stays")
    assert(out(5L) === null)
    // SQL registration
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_strip_accents('caf\u00e9')").head.getString(0) === "cafe")
  }
}
