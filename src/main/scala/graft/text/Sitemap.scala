package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sitemap XML parsing — the crawl-seeding stage between
  * [[graft.operators.Robots.sitemaps]] (which lists the sitemap URLs a
  * host DECLARES) and the frontier (which needs the page URLs those
  * sitemaps CONTAIN). The sitemaps.org protocol has exactly two
  * document shapes and this parser reads both from one column:
  * `<urlset>` files whose `<url>` entries carry page locations, and
  * `<sitemapindex>` files whose `<sitemap>` entries point at further
  * sitemap files (the caller loops those back through its fetcher —
  * recursion is orchestration, not parsing).
  *
  * Scale shape: chained built-in `regexp_extract_all` / `transform` —
  * a pure per-row narrow projection, codegen'd, zero shuffle, fused
  * into the scan at 100 TB exactly like [[Html.outlinks]]. Entity
  * decode reuses [[Html.Entities]] (XML's predefined five are a strict
  * subset), because `<loc>` values are XML-escaped — `&amp;` in query
  * strings is ubiquitous in real sitemaps and an undecoded loc would
  * mint a frontier key no fetched page ever normalizes to.
  *
  * NOT a conformant XML parser by design (the [[Html]] rationale):
  * namespace prefixes, CDATA locs, and comments inside entries are
  * treated as loss within the crawl noise floor. Tag matching is
  * case-sensitive per the protocol (sitemaps.org mandates lowercase
  * element names). */
object Sitemap {

  private def field(block: Column, tag: String): Column =
    // explicit [ \t\n\r] class, not trim(): sitemap generators pad
    // locs with newline-indentation, and SQL trim strips spaces only
    regexp_replace(
      regexp_extract(block, s"(?s)<$tag>(.*?)</$tag>", 1),
      "^[ \t\n\r]+|[ \t\n\r]+$", "")

  private def entry(kind: String)(block: Column): Column = struct(
    lit(kind).as("kind"),
    Html.decodeEntities(field(block, "loc")).as("loc"),
    nullif(field(block, "lastmod"), lit("")).as("lastmod"))

  /** Every entry of a sitemap document:
    * `array<struct<kind string, loc string, lastmod string>>` where
    * `kind` is `url` (a page, from `<urlset>`) or `sitemap` (a child
    * sitemap, from `<sitemapindex>`), `loc` is the entity-decoded
    * location, and `lastmod` is the entry's `<lastmod>` or NULL when
    * absent (incremental crawlers diff it against the frontier's last
    * fetch). Entries without a `<loc>` are dropped — the protocol makes
    * loc mandatory and a blank location seeds nothing. A NULL document
    * yields NULL (absent fetch, not an empty sitemap). */
  def entries(xml: Column): Column = {
    val urls = transform(
      regexp_extract_all(xml, lit("(?s)<url>(.*?)</url>"), lit(1)),
      b => entry("url")(b))
    val subs = transform(
      regexp_extract_all(xml, lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)),
      b => entry("sitemap")(b))
    filter(concat(urls, subs), e => e.getField("loc") =!= "")
  }
}
