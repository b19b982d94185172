package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h"))).head.getString(0)

  test("tags, comments, script and style bodies are stripped; text flows") {
    val html = "<html><head><title>T</title>" +
      "<script type=\"text/javascript\">var x = 1 < 2; //</script>" +
      "<style>p { color: red; }</style></head>" +
      "<body><!-- hidden --><h1>Head</h1><p>one two</p><div>three</div></body></html>"
    assert(extract(html) === "T Head one two three")
  }

  test("script bodies containing < and quotes do not leak") {
    assert(extract("<script>if (a < b && c > d) { s = \"<p>\"; }</script>ok")
      === "ok")
    // multiline + case-insensitive close
    assert(extract("<SCRIPT>\nline1\nline2\n</ScRiPt>x") === "x")
  }

  test("named entities decode, &amp; last (no double decode)") {
    assert(extract("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &apos;t&apos;")
      === "a <tag> \"q\" 's' 't'")
    assert(extract("A&nbsp;B") === "A B")
    // &amp;lt; is the ESCAPED text "&lt;" — must decode to &lt;, not <
    assert(extract("&amp;lt; and &amp;") === "&lt; and &")
  }

  test("whitespace collapses and trims; all-markup becomes empty") {
    assert(extract("  <p>\n\n a \t b </p>\r\n ") === "a b")
    assert(extract("<div><br/><!-- x --></div>") === "")
  }

  test("counters see structure the strip removes") {
    val df = Seq("<a href=\"x\">l</a><p>t</p><script>s</script><A >L</A>").toDF("h")
    val r = df.select(Html.tagCount(col("h")).as("t"),
      Html.linkCount(col("h")).as("l"), Html.scriptCount(col("h")).as("s")).head
    // tags: <a>, </a>, <p>, </p>, <script>, </script>, <A >, </A>
    assert(r.getInt(0) === 8)
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 1)
  }

  test("plain text without markup passes through (modulo whitespace collapse)") {
    assert(extract("just words, no markup") === "just words, no markup")
  }
}
