package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class FixMojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def fix(s: String): String =
    FixMojibake.repair(UTF8String.fromString(s)).toString

  test("repairs single-layer Latin-1 mojibake of 2/3/4-byte sequences") {
    def broken(s: String) =
      new String(s.getBytes("UTF-8"), java.nio.charset.StandardCharsets.ISO_8859_1)
    Seq("café", "naïve übermaß", "€99 and £5", "ok😂 end", "déjà vu")
      .foreach { orig =>
        assert(fix(broken(orig)) === orig, s"repair of '$orig'")
      }
  }

  test("genuine text passes through unchanged — the false-positive guards") {
    // genuine Latin-1 prose: bare 0xE9 fails strict UTF-8 decode
    assert(fix("café") === "café")
    // chars >= 0x100 cannot be a Latin-1 mis-decode (curly quote, CJK)
    assert(fix("it’s fine") === "it’s fine")
    assert(fix("日本語") === "日本語")
    // pure ASCII round-trips to itself: no evidence, no change
    assert(fix("plain ascii text") === "plain ascii text")
    assert(fix("") === "")
    // malformed tails: truncated multi-byte lead, bare continuation,
    // overlong lead 0xC0/0xC1, out-of-range 0xF5 — all abort the repair
    Seq("abcÃ", "abcx", "À", "õ")
      .foreach(s => assert(fix(s) === s, s"must not touch '$s'"))
    // overlong 3-byte (E0 80 80 -> cp 0) and surrogate range abort
    assert(fix("à") === "à")
    assert(fix("í ") === "í ") // D800
  }

  test("doubly-encoded text repairs one layer per application") {
    def broken(s: String) =
      new String(s.getBytes("UTF-8"), java.nio.charset.StandardCharsets.ISO_8859_1)
    val twice = broken(broken("café"))
    assert(fix(twice) === broken("café"))
    assert(fix(fix(twice)) === "café")
  }

  test("runs codegen'd over a column, NULL in NULL out") {
    val got = Seq(Some("cafÃ©"), None, Some("plain"), Some("café"))
      .toDF("t").select(FixMojibake(col("t")).as("f")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got(0) === "café")
    assert(got(1) === null)
    assert(got(2) === "plain")
    assert(got(3) === "café")
  }
}
