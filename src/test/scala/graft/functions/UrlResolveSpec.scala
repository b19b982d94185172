package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlResolveSpec extends SparkSpec {
  import spark.implicits._

  private def res(base: String, ref: String): String = {
    val r = Seq((base, ref)).toDF("b", "r")
      .select(UrlResolve(col("b"), col("r")).as("out")).head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("RFC 3986 5.4 normal examples against base http://a/b/c/d;p?q") {
    val b = "http://a/b/c/d;p?q"
    assert(res(b, "g") === "http://a/b/c/g")
    assert(res(b, "./g") === "http://a/b/c/g")
    assert(res(b, "g/") === "http://a/b/c/g/")
    assert(res(b, "/g") === "http://a/g")
    assert(res(b, "//g") === "http://g")
    assert(res(b, "?y") === "http://a/b/c/d;p?y")
    assert(res(b, "g?y") === "http://a/b/c/g?y")
    assert(res(b, ";x") === "http://a/b/c/;x")
    assert(res(b, "g;x") === "http://a/b/c/g;x")
    assert(res(b, ".") === "http://a/b/c/")
    assert(res(b, "./") === "http://a/b/c/")
    assert(res(b, "..") === "http://a/b/")
    assert(res(b, "../") === "http://a/b/")
    assert(res(b, "../g") === "http://a/b/g")
    assert(res(b, "../..") === "http://a/")
    assert(res(b, "../../") === "http://a/")
    assert(res(b, "../../g") === "http://a/g")
    // abnormal: .. above the root is ignored (5.4.2)
    assert(res(b, "../../../g") === "http://a/g")
    assert(res(b, "../../../../g") === "http://a/g")
    assert(res(b, "/./g") === "http://a/g")
    assert(res(b, "/../g") === "http://a/g")
  }

  test("absolute refs pass through; fragments drop; same-document refs are NULL") {
    val b = "http://host.com/dir/page.html?x=1"
    assert(res(b, "https://other.org/x") === "https://other.org/x")
    assert(res(b, "mailto:a@b.c") === "mailto:a@b.c") // normalize kills it downstream
    assert(res(b, "g#frag") === "http://host.com/dir/g") // ref fragment stripped
    assert(res(b, "#frag") === null) // fragment-only: same document
    assert(res(b, "") === null)
    // query-only keeps the base path, replaces the query
    assert(res(b, "?page=2") === "http://host.com/dir/page.html?page=2")
  }

  test("fail-NULL bases; pathless bases resolve from /") {
    assert(res("not a url", "/x") === null)
    assert(res("relative/path", "x") === null)
    assert(res("http://", "/x") === null) // empty authority
    assert(res("http://h.com", "a") === "http://h.com/a") // empty base path = /
    assert(res("http://h.com?q=1", "b") === "http://h.com/b")
    // colon in the FIRST path segment of a relative ref is not a scheme
    // when a slash comes first
    assert(res("http://h.com/d/", "sub/a:b") === "http://h.com/d/sub/a:b")
  }

  test("dot segments are removed from scheme/authority-carrying refs too (5.2.2)") {
    val b = "http://base.com/d/"
    // absolute ref with dots — T.path = remove_dot_segments(R.path)
    assert(res(b, "http://h.com/a/../b") === "http://h.com/b")
    assert(res(b, "https://h.com/./x/y/../z?q=1") === "https://h.com/x/z?q=1")
    // protocol-relative likewise
    assert(res(b, "//h.com/a/./b/../c") === "http://h.com/a/c")
    // opaque (non-hierarchical) refs stay untouched
    assert(res(b, "mailto:a.b@c.d") === "mailto:a.b@c.d")
    // pathless absolute refs stay untouched
    assert(res(b, "http://h.com?q=1") === "http://h.com?q=1")
  }

  test("scheme detection is ASCII-only (3.1): a Unicode-letter 'scheme' is a relative path") {
    // é:1/x is NOT a scheme — it must resolve as a relative path, not
    // pass through as a bogus absolute that dies downstream
    assert(res("http://h.com/d/", "é:1/x") === "http://h.com/d/é:1/x")
  }

  test("composes with UrlNormalize into one frontier key space") {
    val got = Seq(("http://H.com/a/", "../b?utm_source=x&z=1#f"))
      .toDF("b", "r")
      .select(UrlNormalize(UrlResolve(col("b"), col("r"))).as("k"))
      .head.getString(0)
    assert(got === "http://h.com/b?z=1")
  }
}
