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

  /** Visible text of an HTML document: comments, then script/style
    * blocks (lazy match, so `<` inside code bodies is safe), then every
    * remaining tag → one space; entities decoded; whitespace collapsed
    * and trimmed. An all-markup document becomes the empty string. */
  def extractText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (from, to)) =>
      // literal replace via regexp with the metachar-free pattern
      // (entity names contain only [&#a-z0-9;]); "$" in a replacement
      // would be a group ref, but none of the targets contains one
      regexp_replace(c, from, to)
    }
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
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
