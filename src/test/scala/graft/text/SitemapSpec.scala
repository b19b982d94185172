package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def entriesOf(xml: String): Seq[(String, String, String)] = {
    val r = Seq(xml).toDF("xml")
      .select(Sitemap.entries(col("xml")).as("e")).head
    if (r.isNullAt(0)) null
    else r.getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getString(0), e.getString(1), e.getString(2)))
  }

  test("urlset: page entries with optional lastmod") {
    val got = entriesOf(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>http://a.example/one</loc><lastmod>2026-01-02</lastmod></url>
        |<url><loc>http://a.example/two</loc></url>
        |</urlset>""".stripMargin)
    assert(got === Seq(
      ("url", "http://a.example/one", "2026-01-02"),
      ("url", "http://a.example/two", null)))
  }

  test("sitemapindex: child sitemaps come back as kind=sitemap") {
    val got = entriesOf(
      """<sitemapindex><sitemap><loc>http://a.example/sm1.xml</loc>
        |<lastmod>2025-12-31</lastmod></sitemap>
        |<sitemap><loc>http://a.example/sm2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin)
    assert(got === Seq(
      ("sitemap", "http://a.example/sm1.xml", "2025-12-31"),
      ("sitemap", "http://a.example/sm2.xml", null)))
  }

  test("locs are entity-decoded and whitespace-trimmed (newline indentation included)") {
    val got = entriesOf(
      "<urlset><url><loc>\n   http://a.example/q?x=1&amp;y=2 \t\n</loc></url></urlset>")
    assert(got === Seq(("url", "http://a.example/q?x=1&y=2", null)))
  }

  test("entries without a loc are dropped; a blank loc is a missing loc") {
    val got = entriesOf(
      "<urlset><url><lastmod>2026-03-01</lastmod></url>" +
        "<url><loc>  </loc></url>" +
        "<url><loc>http://a.example/kept</loc></url></urlset>")
    assert(got === Seq(("url", "http://a.example/kept", null)))
  }

  test("degrade: a NULL document is NULL, a non-sitemap document is empty") {
    assert(entriesOf(null) === null)
    assert(entriesOf("<html><body>not a sitemap</body></html>") === Seq.empty)
  }
}
