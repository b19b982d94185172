package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private val masks = Seq(
    ("n_email", Scrub.EmailRe, "<EMAIL>"),
    ("n_num", Scrub.digitRunRe(6), "<NUM>"))

  test("scrubbed masks emails before digit runs and counts each pattern") {
    val df = Seq(
      (1L, "mail bob.smith+x@example.org and card 4111111111111111 ok"),
      (2L, "no pii here"),
      (3L, "two: a@b.io c.d@e-f.co nums 123456 9999999")).toDF("id", "text")
    val out = Scrub.scrubbed(df, "text", masks)
      .select($"id", $"scrubbed", $"n_email", $"n_num")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("mail <EMAIL> and card <NUM> ok", 1L, 1L)))
    assert(out(2L) === (("no pii here", 0L, 0L)))
    assert(out(3L) === (("two: <EMAIL> <EMAIL> nums <NUM> <NUM>", 2L, 2L)))
  }

  test("mask order protects email-embedded digits from the digit mask") {
    // the email's digit run must be claimed by the email mask, not split
    val df = Seq((1L, "x1234567@mail.com")).toDF("id", "text")
    val r = Scrub.scrubbed(df, "text", masks).select($"scrubbed").head.getString(0)
    assert(r === "<EMAIL>")
  }

  test("digit runs shorter than minLen survive") {
    val df = Seq((1L, "v1 build 12345 ok 123456")).toDF("id", "text")
    val r = Scrub.scrubbed(df, "text", masks)
      .select($"scrubbed", $"n_num").head
    assert(r.getString(0) === "v1 build 12345 ok <NUM>")
    assert(r.getLong(1) === 1L)
  }

  test("redact applies masks sequentially over the same column") {
    val c = Scrub.redact(lit("a@b.co 123456"), masks.map { case (_, re, repl) => (re, repl) })
    assert(Seq(1).toDF("x").select(c).head.getString(0) === "<EMAIL> <NUM>")
  }

  test("dedupLinesWithin keeps first occurrences in order, per document") {
    val df = Seq(
      (1L, "nav\nbody one\nnav\nbody two\nnav"),
      (2L, "only line"),
      (3L, "x\nx\nx")).toDF("id", "t")
    val got = Scrub.dedupLinesWithin(df, "t").collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === (("nav\nbody one\nbody two", 5L, 2L)))
    assert(got(2L) === (("only line", 1L, 0L)))
    assert(got(3L) === (("x", 3L, 2L)))
    // the original text column is untouched (clean is a NEW column)
    assert(Scrub.dedupLinesWithin(df, "t").select("t").collect()
      .map(_.getString(0)).toSet === df.select("t").collect().map(_.getString(0)).toSet)
  }
}
