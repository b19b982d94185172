package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): Option[String] = {
    val r = Seq(u).toDF("u").select(UrlNormalize(col("u"))).head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("scheme and host lowercase; path/query case preserved") {
    assert(norm("HtTpS://WWW.Example.COM/Path?Q=V")
      === Some("https://www.example.com/Path?Q=V"))
  }

  test("default ports drop; others keep; fragment always drops") {
    assert(norm("http://example.com:80/a#frag") === Some("http://example.com/a"))
    assert(norm("https://example.com:443/") === Some("https://example.com/"))
    assert(norm("https://example.com:8443/p#x") === Some("https://example.com:8443/p"))
  }

  test("empty path becomes /; whitespace trims") {
    assert(norm("  http://example.com  ") === Some("http://example.com/"))
    assert(norm("http://example.com?a=1") === Some("http://example.com/?a=1"))
  }

  test("tracking params drop, rest sort bytewise, emptied query drops its ?") {
    assert(norm("http://e.com/p?x=2&utm_source=t&a=1")
      === Some("http://e.com/p?a=1&x=2"))
    assert(norm("http://e.com/p?utm_medium=m&gclid=1&fbclid=2&msclkid=3")
      === Some("http://e.com/p"))
    assert(norm("http://e.com/p?") === Some("http://e.com/p"))
    assert(norm("http://e.com/p?b=2&&a=10") === Some("http://e.com/p?a=10&b=2"))
    // utm_ match is on the NAME only; a VALUE containing utm_ survives
    assert(norm("http://e.com/p?ref=utm_x") === Some("http://e.com/p?ref=utm_x"))
  }

  test("fail-NULL: no scheme, empty host, bad port, userinfo") {
    assert(norm("example.com/path") === None)
    assert(norm("://example.com") === None)
    assert(norm("1http://example.com") === None)
    assert(norm("http:///path") === None)
    assert(norm("http://example.com:8x/") === None)
    assert(norm("http://example.com:/") === None)
    assert(norm("http://user:pw@example.com/") === None)
    assert(norm("NULL in NULL out".take(0) + "not a url") === None)
  }

  test("fail-NULL: bracketed IPv6 and multi-colon authorities, EVERY spelling") {
    // both the with-port and portless spellings of the same address must
    // land on the SAME side (NULL) — one key + one scrub-queue row would
    // split a single logical URL across the key space
    assert(norm("http://[::1]:8080/") === None)
    assert(norm("http://[::1]/") === None)
    assert(norm("http://[::1]:80/") === None)
    assert(norm("http://a:b:80/") === None)
  }

  test("param sort is UTF-8 bytewise, not UTF-16 code-unit order") {
    // U+FFFD (EF BF BD) sorts BEFORE U+1F600 (F0 9F 98 80) bytewise;
    // String.compareTo would put the surrogate pair (0xD83D) first
    assert(norm("http://e.com/p?😀=1&�=1")
      === Some("http://e.com/p?�=1&😀=1"))
  }

  test("property: canonicalization is idempotent over generated component mixes") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val scheme = Gen.oneOf("http", "HTTP", "https", "HtTpS")
    val host = Gen.oneOf("Example.COM", "a.b.c", "X.org")
    val port = Gen.oneOf("", ":80", ":443", ":8080")
    val path = Gen.oneOf("", "/", "/A/b", "/p%20q")
    val params = Gen.listOf(Gen.oneOf("a=1", "B=2", "utm_s=1", "gclid=9", "z", ""))
      .map(ps => if (ps.isEmpty) "" else "?" + ps.mkString("&"))
    val frag = Gen.oneOf("", "#f", "#a b")
    val gen = for {
      s <- scheme; h <- host; po <- port; pa <- path; q <- params; f <- frag
    } yield s"$s://$h$po$pa$q$f"
    val prop = Prop.forAll(gen) { u =>
      val once = graft.functions.UrlNormalize.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(u))
      once != null && {
        val twice = graft.functions.UrlNormalize.normalize(once)
        twice != null && twice.toString == once.toString
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("illegal host characters fail NULL (the scrub-queue contract)") {
    def norm(u: String): String = {
      val r = graft.functions.UrlNormalize.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(u))
      if (r == null) null else r.toString
    }
    // spaces, underscores, brackets, and anything else outside the RFC
    // 1123 letter-digit-hyphen repertoire must land in the NULL queue,
    // never half-normalize into the dedup key space
    for (bad <- Seq("http://exa mple.com/a", "http://my_host.example.com/",
        "http://[::1]:8080/", "http://exam!ple.com/", "http://héte.fr/"))
      assert(norm(bad) == null, s"expected NULL for $bad")
    // the legal repertoire still passes
    assert(norm("http://a-B.example9.com/x") == "http://a-b.example9.com/x")
  }

  test("NULL in NULL out; codegen and eval agree") {
    val df = Seq(Some("HTTP://A.B:80/x?utm_a=1&z=1&c=2"), None).toDF("u")
    val got = df.select(UrlNormalize(col("u"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq === Seq("http://a.b/x?c=2&z=1", null))
    // interpreted path (filter forces eval in some plans): same result
    assert(df.filter(UrlNormalize(col("u")) === "http://a.b/x?c=2&z=1").count() === 1L)
  }
}
