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
