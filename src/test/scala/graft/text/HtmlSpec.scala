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

  private def mainOf(html: String, minChars: Int = 15,
                     maxLinkPermille: Int = 300): (String, Long, Long) = {
    val r = Seq(html).toDF("h")
      .select(Html.mainContentReport(col("h"), minChars, maxLinkPermille).as("r"))
      .select(col("r.main"), col("r.n_blocks"), col("r.n_kept")).head
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  test("mainContent drops nav/sidebar/footer boilerplate, keeps body prose") {
    val html = "<html><head><title>T</title><style>p{}</style></head><body>" +
      "<nav><a href=\"/a\">Home</a> <a href=\"/b\">About</a> <a href=\"/c\">Contact</a></nav>" +
      "<h1>Doc</h1>" +
      "<p>This paragraph is long enough to keep and has no links at all.</p>" +
      "<p>Another keeper paragraph with one small <a href=\"x\">ref</a> inside.</p>" +
      "<ul><li><a href=\"/1\">Link one</a></li><li><a href=\"/2\">Link two</a></li></ul>" +
      "<footer>Contact <a href=\"/t\">Terms</a></footer></body></html>"
    val (main, nBlocks, nKept) = mainOf(html)
    assert(main === "This paragraph is long enough to keep and has no links at all. " +
      "Another keeper paragraph with one small ref inside.")
    // title, nav, h1, p, p, li, li, footer
    assert(nBlocks === 8L)
    assert(nKept === 2L)
  }

  test("mainContent link-density rule: same text flips on anchor share") {
    // 22 link chars of 47 total = 468 permille: dropped at 300, kept at 600
    val html = "<div>plain words here padding <a href=\"u\">linked anchor text run</a></div>"
    assert(mainOf(html, minChars = 10, maxLinkPermille = 300)._3 === 0L)
    assert(mainOf(html, minChars = 10, maxLinkPermille = 600)._3 === 1L)
  }

  test("mainContent link-density survives multi-megabyte blocks (long arithmetic)") {
    // one block with >2.1M anchor chars: int32 `link * 1000` would throw
    // under ANSI (or wrap negative and KEEP the link farm with ANSI off)
    val words = "word " * 300000   // 1.5M plain chars
    val anchor = "link " * 500000  // 2.5M link chars
    val html = "<div>" + words + "<a href=\"u\">" + anchor + "</a></div>"
    // ~62% link density: dropped at 300 permille, kept at 700
    assert(mainOf(html, minChars = 10, maxLinkPermille = 300)._3 === 0L)
    assert(mainOf(html, minChars = 10, maxLinkPermille = 700)._3 === 1L)
  }

  test("mainContent decodes entities inside blocks and handles nav shells") {
    val (m, _, k) = mainOf("<p>alpha &amp; beta gamma delta epsilon</p>")
    assert(m === "alpha & beta gamma delta epsilon" && k === 1L)
    // an all-boilerplate page extracts to the empty string, 0 kept
    val (m2, b2, k2) = mainOf(
      "<nav><a href=\"/a\">Home page</a> <a href=\"/b\">About page</a></nav>")
    assert(m2 === "" && b2 === 1L && k2 === 0L)
    // inline tags do NOT split blocks: bold text stays in its paragraph
    val (m3, b3, _) = mainOf("<p>one <b>two</b> three four five six</p>")
    assert(m3 === "one two three four five six" && b3 === 1L)
  }

  test("block tag names match on a boundary, not as prefixes of inline tags") {
    // <link>, <picture>, <param>, <progress> share prefixes with block
    // tags (li, p) — a prefix match would split the paragraph at each,
    // fragmenting it below minChars and changing the density decision
    val html = "<p>alpha beta <link rel=\"x\" href=\"y\"/> gamma delta " +
      "<picture><img src=\"z\"/></picture> epsilon zeta eta theta</p>"
    val (m, b, k) = mainOf(html, minChars = 30)
    assert(b === 1L, s"inline/metadata tags split the block: $b blocks")
    assert(k === 1L)
    assert(m === "alpha beta gamma delta epsilon zeta eta theta")
    // the real block tags still split: li vs link, p vs picture
    val (_, b2, _) = mainOf("<li>one two three</li><p>four five six</p>")
    assert(b2 === 2L)
  }

  test("outlinks: quote styles, entity decode, order, no edges from comments/scripts") {
    import org.apache.spark.sql.functions.col
    def links(html: String): Seq[String] =
      Seq(html).toDF("h").select(Html.outlinks(col("h")).as("l"))
        .head.getSeq[String](0)
    val html = "<html><body>" +
      "<a href=\"/double\">a</a>" +
      "<a class='x' href='/single'>b</a>" +
      "<a href=/unquoted>c</a>" +
      "<a href=\"?a=1&amp;b=2\">entity</a>" +
      "<A HREF=\"/upper\">case</A>" +
      "<a name=\"anchor-no-href\">skip</a>" +
      "<script>var s = '<a href=\"/from-script\">x</a>';</script>" +
      "<!-- <a href=\"/from-comment\">x</a> -->" +
      "</body></html>"
    assert(links(html) ===
      Seq("/double", "/single", "/unquoted", "?a=1&b=2", "/upper"))
    assert(links("<p>no links at all</p>") === Seq.empty)
    // a bare <a> with no space never matches as "<ahref..." garbage
    assert(links("<a>bare</a><abbr href=\"/not-an-anchor\">t</abbr>") === Seq.empty)
  }

  test("outlinks: attribute-aware matching (data-href, href= in values, '>' in values)") {
    import org.apache.spark.sql.functions.col
    def links(html: String): Seq[String] =
      Seq(html).toDF("h").select(Html.outlinks(col("h")).as("l"))
        .head.getSeq[String](0)
    // data-href must not suffix-match as href (very common tracking markup)
    assert(links("<a data-href=\"/tracked\" class=\"x\">t</a>") === Seq.empty)
    // "href=" INSIDE an earlier attribute value mints no garbage edge and
    // the genuine href still extracts
    assert(links("<a title=\"see href= docs\" href=\"/real\">t</a>")
      === Seq("/real"))
    // '>' inside a quoted value must not truncate the attribute scan
    assert(links("<a title=\"a>b\" href=\"/x\">t</a>") === Seq("/x"))
    assert(links("<a onclick=\"if(i>0)go()\" href='/y'>t</a>") === Seq("/y"))
    // valueless attributes and spaced equals still parse
    assert(links("<a download href = \"/z\">t</a>") === Seq("/z"))
    // xhref is not href
    assert(links("<a xhref=\"/t\" >t</a>") === Seq.empty)
  }
}
