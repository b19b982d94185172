package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rulesOf(host: String, txt: String, agent: String = "graftbot") =
    Robots.parse(Seq((host, txt)).toDF("host", "robots_txt"),
        "host", "robots_txt", agent)
      .collect().map(r => (r.getBoolean(1), r.getString(2))).toSet

  test("parse: star group, comments, empty Disallow dropped, case-insensitive keys") {
    val txt = "# site rules\nUser-Agent: *\nDisallow: /private # trailing\n" +
      "Allow: /private/ok\nDisallow:\nCrawl-delay: 5"
    assert(rulesOf("h", txt) === Set((false, "/private"), (true, "/private/ok")))
  }

  test("parse: a named-agent group makes the host ignore its * groups (RFC 2.2.1)") {
    val txt = "User-agent: GraftBot\nDisallow: /\nAllow: /public\n" +
      "User-agent: *\nAllow: /"
    assert(rulesOf("h", txt) === Set((false, "/"), (true, "/public")))
    // a different agent sees only the * group
    assert(rulesOf("h", txt, agent = "otherbot") === Set((true, "/")))
  }

  test("parse: consecutive User-agent lines accumulate into ONE group") {
    val txt = "User-agent: graftbot\nUser-agent: other\nDisallow: /shared\n" +
      "User-agent: third\nDisallow: /t"
    assert(rulesOf("h", txt) === Set((false, "/shared")))
    assert(rulesOf("h", txt, agent = "third") === Set((false, "/t")))
  }

  test("parse: rules before any User-agent line belong to no group and drop") {
    assert(rulesOf("h", "Disallow: /orphan\nUser-agent: *\nDisallow: /x")
      === Set((false, "/x")))
  }

  private def decide(rulesTxt: String, paths: Seq[String]): Map[String, Boolean] = {
    val rules = Robots.parse(Seq(("h", rulesTxt)).toDF("host", "robots_txt"),
      "host", "robots_txt", "graftbot")
    val urls = paths.zipWithIndex.map { case (p, i) => (i.toLong, "h", p) }
      .toDF("id", "host", "path")
    Robots.isAllowed(urls, rules, "host", "path")
      .collect().map(r => r.getAs[String]("path") -> r.getAs[Boolean]("allowed")).toMap
  }

  test("decision: longest match wins; Allow wins length ties; default allow") {
    val got = decide("User-agent: *\nAllow: /a/b\nDisallow: /a",
      Seq("/a/b/deep", "/a/c", "/z"))
    assert(got === Map("/a/b/deep" -> true, "/a/c" -> false, "/z" -> true))
    // equal length, allow wins the tie
    val tie = decide("User-agent: *\nDisallow: /ab\nAllow: /ab", Seq("/abx"))
    assert(tie === Map("/abx" -> true))
  }

  test("decision: * wildcard and trailing $ anchor; inner $ literal; regex chars quoted") {
    val got = decide("User-agent: *\nDisallow: /*.pdf$\nDisallow: /q?x\nDisallow: /d$r",
      Seq("/doc.pdf", "/doc.pdfx", "/q?x=1", "/qqx", "/d$rest", "/dr"))
    assert(got("/doc.pdf") === false)   // anchored: .pdf at the end
    assert(got("/doc.pdfx") === true)   // $ anchor keeps the x out
    assert(got("/q?x=1") === false)     // ? is literal, prefix matches
    assert(got("/qqx") === true)        // ? must NOT act as regex optional
    assert(got("/d$rest") === false)    // inner $ literal
    assert(got("/dr") === true)         // inner $ must not anchor-and-vanish
  }

  test("sitemaps: group-independent, case-insensitive, position-free; rules unaffected") {
    val txt = "Sitemap: https://h/top.xml\nUser-agent: *\nAllow: /a\n" +
      "sitemap: https://h/mid.xml # trailing comment\nDisallow: /b\n" +
      "SITEMAP: https://h/end.xml"
    val df = Seq(("h", txt)).toDF("host", "robots_txt")
    assert(Robots.sitemaps(df, "host", "robots_txt").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("h", "https://h/top.xml"), ("h", "https://h/mid.xml"),
        ("h", "https://h/end.xml")))
    // the mid-group sitemap line must not split the group or leak a rule
    assert(rulesOf("h", txt) === Set((true, "/a"), (false, "/b")))
    // a host with no directives emits nothing
    assert(Robots.sitemaps(Seq(("h2", "User-agent: *\nDisallow: /"))
      .toDF("host", "robots_txt"), "host", "robots_txt").count() === 0)
  }

  test("join twin: decision-identical to the literal form on every edge") {
    // the q149/q189 literal↔join pairing: same semantics, different scale
    // plan — sweep the tie-break/wildcard/anchor/rule-less edges through
    // BOTH forms and require row identity
    val txtA = "User-agent: *\nAllow: /a/b\nDisallow: /a\nDisallow: /*.pdf$\n" +
      "Disallow: /ab\nAllow: /ab"
    val txtB = "User-agent: graftbot\nDisallow: /\nAllow: /public\nUser-agent: *\nAllow: /"
    val rules = Robots.parse(
      Seq(("ha", txtA), ("hb", txtB)).toDF("host", "robots_txt"),
      "host", "robots_txt", "graftbot")
    val urls = Seq(
      (1L, "ha", "/a/b/deep"), (2L, "ha", "/a/c"), (3L, "ha", "/z"),
      (4L, "ha", "/doc.pdf"), (5L, "ha", "/doc.pdfx"), (6L, "ha", "/abx"),
      (7L, "hb", "/public/x"), (8L, "hb", "/private"), (9L, "bare", "/x"))
      .toDF("id", "host", "path")
    val lit = Robots.isAllowed(urls, rules, "host", "path")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("allowed")).toMap
    val join = Robots.isAllowedJoin(urls, rules, "host", "path")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("allowed")).toMap
    assert(join === lit)
    assert(lit(9L) === true) // the rule-less host rides the NULL-array default
  }

  test("join twin: NULL path/host and null-field rules degrade like the literal form") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rulesSchema = StructType(Seq(StructField("host", StringType),
      StructField("allow", BooleanType), StructField("pattern", StringType)))
    val rules = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("h", true, "/ok"), Row("h", false, "/"),
        Row(null, false, "/ghost"), Row("h2", null, "/x"),
        Row("h2", false, null))), rulesSchema)
    val urlsSchema = StructType(Seq(StructField("id", LongType),
      StructField("host", StringType), StructField("path", StringType)))
    val urls = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "h", "/ok/page"), Row(2L, "h", "/other"),
        Row(3L, null, "/x"), Row(4L, "h", null), Row(5L, "h2", "/x"))),
      urlsSchema)
    val got = Robots.isAllowedJoin(urls, rules, "host", "path")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("allowed")).toMap
    // NULL host → no rules row → allow; NULL path → NULL decision → the
    // coalesced allow default; null-field rules decide nothing
    assert(got === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true, 5L -> true))
  }

  test("decision: hosts without rules (or robots at all) default to allowed") {
    val rules = Robots.parse(
      Seq(("ruled", "User-agent: *\nDisallow: /")).toDF("host", "robots_txt"),
      "host", "robots_txt", "graftbot")
    val urls = Seq((1L, "ruled", "/x"), (2L, "bare", "/x")).toDF("id", "host", "path")
    val got = Robots.isAllowed(urls, rules, "host", "path")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("allowed")).toMap
    assert(got === Map(1L -> false, 2L -> true))
    val kept = Robots.filterAllowed(urls, rules, "host", "path")
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(kept === Seq(2L))
  }
}
