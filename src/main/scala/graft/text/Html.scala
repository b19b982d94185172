package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the WARC→WET step a web-crawl corpus runs
  * BEFORE any quality/language/dedup stage (CCNet, C4, RefinedWeb all
  * start from tag-stripped text): drop the machinery (comments, script
  * and style blocks, tags), decode the ubiquitous named entities,
  * collapse whitespace. Everything is chained BUILT-IN `regexp_replace`
  * — codegen'd, narrow, zero shuffle; at 100 TB this runs as a pure
  * map stage fused into the scan.
  *
  * Determinism across engines: patterns avoid constructs whose
  * semantics differ between Java regex (Spark) and RE2 (DuckDB oracle)
  * — explicit `[ \t\n\r]` classes instead of `\s` (Java's `\s` includes
  * 0x0B, RE2's does not), inline `(?is)` flags both support, lazy
  * quantifiers both support. Entity decode covers the named five +
  * nbsp and decodes `&amp;` LAST (decoding it first would re-activate
  * entities it was escaping — the classic double-decode bug).
  *
  * NOT a full HTML5 parser by design: no numeric character references,
  * no CDATA, no conditional comments. Real crawl extraction treats
  * those as loss within the quality-filter noise floor; a parser would
  * be per-row JVM object churn for a rounding error. */
object Html {

  /** The named entities decoded, in APPLICATION ORDER (`&amp;` last). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** Comments, script bodies, and style blocks removed (lazy match, so
    * `<` inside code bodies is safe) — the shared first stage of
    * [[extractText]] and [[mainContentReport]]. */
  private def stripNonContent(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment, "(?is)<script[^>]*>.*?</script>", " ")
    regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
  }

  /** The [[Entities]] fold (application order, `&amp;` last). Shared
    * with [[Sitemap]] — sitemap `<loc>` values are XML-escaped with the
    * same named five, and XML escaping is a strict subset of this
    * table. */
  private[text] def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (from, to)) =>
      // literal replace via regexp with the metachar-free pattern
      // (entity names contain only [&#a-z0-9;]); "$" in a replacement
      // would be a group ref, but none of the targets contains one
      regexp_replace(acc, from, to)
    }

  /** Inline cleanup of a tag-bearing fragment: remaining tags → one
    * space, entities decoded, whitespace collapsed, trimmed. */
  private def cleanInline(c: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(c, "<[^>]*>", " ")),
      "[ \t\n\r]+", " "))

  /** Visible text of an HTML document: comments, then script/style
    * blocks (lazy match, so `<` inside code bodies is safe), then every
    * remaining tag → one space; entities decoded; whitespace collapsed
    * and trimmed. An all-markup document becomes the empty string. */
  def extractText(html: Column): Column =
    cleanInline(stripNonContent(html))

  /** BLOCK-level structural tags — the segmentation boundary for
    * [[mainContentReport]]: text between consecutive occurrences of any
    * of these is one content block (the jusText/boilerpipe block
    * definition). Inline tags (`a`, `b`, `span`, `em`, …) deliberately
    * do NOT split — anchor text belongs to its surrounding block, which
    * is exactly what makes link density computable per block. The
    * `(?=[\s/>])` boundary after the name group keeps the alternation
    * from PREFIX-matching longer inline/metadata tag names (`<link>`
    * and `<li…>` both start with `li`; `<picture>`, `<param>`,
    * `<progress>` start with `p`) — without it those split blocks too,
    * perturbing the min-chars and link-density decisions on real
    * pages. */
  val BlockTagPattern: String =
    "(?i)</?(html|head|title|body|p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|br|hr|section|article|header|footer|nav|aside|main|blockquote|pre|form|fieldset|figure|figcaption)(?=[\\s/>])[^>]*>"

  /** MAIN-CONTENT extraction — the boilerplate-aware upgrade of
    * [[extractText]]: a stripped-tags WET pass keeps nav/footer/sidebar
    * text in the corpus, where only the fraction repeated ACROSS
    * documents is ever caught by line-level dedup; the
    * density-family extractors every production web pipeline runs
    * (jusText, Arc90/Readability, boilerpipe lineage) instead score
    * each BLOCK and drop the boilerplate-shaped ones before any
    * downstream stage sees it. Rules (the two robust jusText/Arc90
    * signals, integer-exact so the decision replays cross-engine):
    *
    *  - segment at [[BlockTagPattern]] tags (comments/script/style
    *    stripped first); a block's text is its inline-cleaned visible
    *    text ([[extractText]]'s tag/entity/whitespace treatment);
    *  - drop short blocks: `length < minChars` (headlines, buttons,
    *    copyright lines carry no training-corpus signal alone);
    *  - drop link-dense blocks: `linkChars * 1000 > maxLinkPermille *
    *    totalChars`, where linkChars sums the cleaned text inside the
    *    block's `<a>…</a>` spans — nav bars and sidebars are mostly
    *    anchor text, body prose is not (Arc90's link-density rule).
    *
    * Returns `struct(main, n_blocks, n_kept)`: the kept blocks joined
    * with one space, the nonempty-block count, and the kept count —
    * the extraction-audit counters a crawl dashboard thresholds
    * (`n_kept = 0` is a nav shell; `n_kept/n_blocks` is the page's
    * content share). Everything is builtin higher-order/regexp
    * expressions over one row — a pure narrow map stage, no shuffle,
    * fused into the scan at 100 TB exactly like [[extractText]].
    * Splitting uses the 0x1F unit separator as the block sentinel;
    * documents containing that control character are out of contract
    * (scrub upstream — the [[graft.text.Scrub]] pass drops C0
    * controls).
    *
    * Documented heuristic limit: link chars are counted from `<a>…</a>`
    * spans WITHIN each block, so an anchor wrapping a block-level
    * element (HTML5-legal `<a><div>…</div></a>`) is split at the block
    * boundary and its inner text is not counted as link chars — a link
    * farm built that way evades the density rule (the min-chars rule
    * and cross-document line dedup still apply to it). The same
    * within-block trade-off is in jusText's own segmentation; counting
    * anchor spans before splitting would make every block boundary
    * inside an anchor ambiguous. */
  /** Per-block (txt, link-chars) structs of a page — the shared expensive
    * stage of [[mainContentReport]] and [[mainContent]]: block-split at
    * [[BlockTagPattern]] (0x1F unit-separator sentinel; documents carrying
    * that control char are out of contract — the Scrub pass drops C0
    * controls), inline-cleaned text per block, anchor-span char count per
    * block. */
  private def scoredBlocks(html: Column): Column = {
    val bs = split(regexp_replace(stripNonContent(html), BlockTagPattern, "\u001f"),
      "\u001f")
    transform(bs, b => struct(
      cleanInline(b).as("txt"),
      aggregate(
        regexp_extract_all(b, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
        lit(0), (acc, a) => acc + length(cleanInline(a))).as("link")))
  }

  def mainContentReport(html: Column, minChars: Int = 25,
                        maxLinkPermille: Int = 333): Column = {
    require(minChars >= 1, s"mainContentReport: minChars must be >= 1, got $minChars")
    require(maxLinkPermille >= 0 && maxLinkPermille <= 1000,
      s"mainContentReport: maxLinkPermille must be in [0, 1000], got $maxLinkPermille")
    val scored = scoredBlocks(html)
    // ONE fold computes all three report fields so the block-split chain
    // above appears exactly once in the expression tree. The previous
    // struct(array_join(kept...), size(nonempty), size(kept)) formulation
    // re-evaluated the whole regex chain once PER STRUCT FIELD: callers
    // extract the fields, CollapseProject inlines a CreateNamedStruct
    // whose consumers are extract-only, and SimplifyExtractValueOps then
    // splits it into three independent copies of the chain (measured: the
    // q239 plan carried the split(regexp_replace(...)) subtree 3x). A
    // fold result is opaque to that rewrite, so the chain survives as one
    // shared subtree. Semantics are unchanged: n_blocks counts nonempty
    // blocks, kept blocks satisfy the min-chars + link-density rules
    // (minChars >= 1 makes every kept block nonempty), kept text joins
    // with one space in block order, and the LONG arithmetic keeps the
    // anchor-farm overflow guard (int32 char counts x 1000 overflow past
    // ~2.1M link chars per block — under ANSI that kills the job on one
    // bad page, and with ANSI off the wrap would KEEP the link farm).
    // NULL html still yields the struct-of-NULLs the old formulation
    // produced (the fold is NULL over a NULL array; the coalesce arm
    // restores the per-field-NULL shape).
    val zero = struct(lit("").as("main"), lit(0L).as("n_blocks"),
      lit(0L).as("n_kept"))
    val folded = aggregate(scored, zero, (acc, s) => {
      val txt = s.getField("txt")
      val len = length(txt)
      val keep = len >= lit(minChars) &&
        s.getField("link").cast("long") * lit(1000L) <=
          len.cast("long") * lit(maxLinkPermille.toLong)
      struct(
        when(keep, when(acc.getField("n_kept") === 0L, txt)
            .otherwise(concat(acc.getField("main"), lit(" "), txt)))
          .otherwise(acc.getField("main")).as("main"),
        (acc.getField("n_blocks") + when(len > lit(0), 1L).otherwise(0L)).as("n_blocks"),
        (acc.getField("n_kept") + when(keep, 1L).otherwise(0L)).as("n_kept"))
    })
    coalesce(folded, struct(
      lit(null).cast("string").as("main"),
      lit(null).cast("long").as("n_blocks"),
      lit(null).cast("long").as("n_kept")))
  }

  /** The kept main text alone — [[mainContentReport]]'s `main` field,
    * computed WITHOUT the audit counters: single-field callers (curation
    * keeps only the text) skip the fold's count bookkeeping — one filter +
    * array_join over the same [[scoredBlocks]], value-identical to
    * `mainContentReport(...).getField("main")` (same keep rules, same
    * single-space join; a kept block is nonempty because minChars >= 1). */
  def mainContent(html: Column, minChars: Int = 25,
                  maxLinkPermille: Int = 333): Column = {
    require(minChars >= 1, s"mainContent: minChars must be >= 1, got $minChars")
    require(maxLinkPermille >= 0 && maxLinkPermille <= 1000,
      s"mainContent: maxLinkPermille must be in [0, 1000], got $maxLinkPermille")
    val kept = filter(scoredBlocks(html), s =>
      length(s.getField("txt")) >= minChars &&
        s.getField("link").cast("long") * lit(1000L) <=
          length(s.getField("txt")).cast("long") * lit(maxLinkPermille.toLong))
    array_join(transform(kept, s => s.getField("txt")), " ")
  }

  /** OUTLINK extraction — the crawl-graph half of extraction (WAT-style:
    * where [[extractText]]/[[mainContentReport]] take the page's words,
    * this takes its edges, feeding frontier expansion and host-graph
    * analytics): the `href` values of `<a>` tags, in document order,
    * entity-decoded (`href="?a=1&amp;b=2"` is the HTML-correct spelling
    * of `?a=1&b=2` — skipping the decode corrupts every multi-param
    * link), quotes stripped. Raw references, NOT resolved URLs — compose
    * [[graft.functions.UrlResolve]] against the page's own URL and then
    * [[graft.functions.UrlNormalize]] for the frontier key space; the
    * split keeps this a pure per-row builtin-regexp projection (one
    * `regexp_extract_all`, codegen'd, fused into the scan at 100 TB).
    * Comments and script/style bodies are stripped first — a commented-
    * out nav or a JS string literal must not mint edges. Unquoted hrefs
    * (legacy HTML) end at whitespace or `>`. */
  def outlinks(html: Column): Column = {
    val cleaned = stripNonContent(html)
    // attribute-aware: the skip before `href` consumes WHOLE attributes
    // (name, optional =value with quoted values free to contain '>' or
    // the text "href="), each ending in whitespace — so `data-href`
    // cannot suffix-match, `title="see href= docs"` cannot mint a
    // garbage edge from inside a value, and `title="a>b"` does not
    // truncate the tag scan before the real href
    val attr = "[^> \t\n\r=]+(?:[ \t\n\r]*=[ \t\n\r]*" +
      "(?:\"[^\"]*\"|'[^']*'|[^ \t\n\r>]*))?[ \t\n\r]+"
    val hrefs = regexp_extract_all(cleaned,
      lit("(?is)<a[ \t\n\r]+(?:" + attr + ")*?" +
        "href[ \t\n\r]*=[ \t\n\r]*(\"[^\"]*\"|'[^']*'|[^ \t\n\r>]+)"),
      lit(1))
    transform(hrefs, h => decodeEntities(
      regexp_replace(h, "^[\"']|[\"']$", "")))
  }

  /** Markup-shape counters for extraction audits: how much structure
    * did the strip remove? `n_tags` counts every element open/close,
    * `n_links` anchors, `n_scripts` script blocks — crawl dashboards
    * threshold these (a page that is 95 % tags by count is a nav shell,
    * not prose). */
  def tagCount(html: Column): Column =
    size(regexp_extract_all(html, lit("<[a-zA-Z/][^>]*>"), lit(0)))
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a[ \t\n\r>]"), lit(0)))
  def scriptCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<script[^>]*>"), lit(0)))
}
