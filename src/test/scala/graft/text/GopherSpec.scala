package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) =
    Gopher.quality(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").head

  test("counts are exact on a hand-built document") {
    // 2 lines; words: the(3) be(2) fish(4) ...(3) #tag(4) 42(2); bullet line
    val r = one("the be fish ... #tag 42\n- the end...")
    assert(r.getAs[Long]("n_words") === 6L + 3L)
    assert(r.getAs[Long]("n_lines") === 2L)
    assert(r.getAs[Long]("n_bullet") === 1L)
    assert(r.getAs[Long]("n_ellipsis") === 1L) // only line 2 ENDS with ...
    assert(r.getAs[Long]("n_sym") === 3L)      // "...", "#", "..."
    assert(r.getAs[Long]("n_stop") === 2L)     // the + be; the dup counts once
    // mean: (3+2+4+3+4+2 + 1+3+6) * 1000 / 9 = 28000/9 = 3111
    assert(r.getAs[Long]("mean_wlen_milli") === 3111L)
  }

  test("each rule flags both ways") {
    // 60 words, all alpha, 4 distinct stopwords, mean length 3200 milli
    val pass = ("the be of and worded " * 12).trim
    assert(one(pass).getAs[Long]("keep") === 1L)
    assert(one("too few words").getAs[Long]("r_words") === 0L)
    assert(one(("a " * 60).trim).getAs[Long]("r_wlen") === 0L)     // mean 1.0
    assert(one(("# " * 30 + "word " * 30).trim).getAs[Long]("r_sym") === 0L)
    assert(one((1 to 20).map(i => s"- b$i").mkString("\n"))
      .getAs[Long]("r_bullet") === 0L)
    assert(one("one...\ntwo...\nthree").getAs[Long]("r_ellipsis") === 0L)
    assert(one(("42 " * 40 + "word " * 10).trim).getAs[Long]("r_alpha") === 0L)
    assert(one(("word " * 60).trim).getAs[Long]("r_stop") === 0L)
  }

  test("empty and single-line text degrade sanely") {
    val r = one("")
    assert(r.getAs[Long]("n_words") === 0L)
    assert(r.getAs[Long]("mean_wlen_milli") === 0L)
    assert(r.getAs[Long]("keep") === 0L) // fails the word-count floor
  }

  test("NULL text pins n_stop to 0 (legacy sizeOfNull would leak -1)") {
    // size(regexp_extract_all(NULL)) is -1 under Spark's default legacy
    // sizeOfNull, so a coalesce never fires — the explicit isNull arm
    // must restore the 0 the per-stopword when() sum emitted
    val r = one(null)
    assert(r.getAs[Long]("n_stop") === 0L)
    assert(r.getAs[Long]("keep") === 0L)
  }

  test("compressionRatioMilli: boilerplate below prose below noise; fail-closed on bytes") {
    val docs = Seq(
      (1L, "spark " * 200),                       // boilerplate
      (2L, "the quick brown fox jumps over the lazy dog and then " * 20),
      (3L, (1 to 40).map(i => java.security.MessageDigest.getInstance("MD5")
        .digest(s"x$i".getBytes).map("%02x".format(_)).mkString).mkString)
    ).toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
        Gopher.compressionRatioMilli(col("text")).as("m"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) < r(2L) && r(2L) < r(3L))
    assert(r(1L) > 0L && r(3L) <= 1100L)
    // empty text -> NULL (no signal), not a division blow-up
    val e = Seq((1L, "")).toDF("doc_id", "text")
      .select(Gopher.compressionRatioMilli(col("text"))).head
    assert(e.isNullAt(0))
  }

  test("DeflateSize round-trips and is deterministic across evaluations") {
    val df = Seq("alpha beta gamma delta " * 50).toDF("t")
    val s1 = df.select(graft.functions.DeflateSize(col("t"))).head.getLong(0)
    val s2 = df.select(graft.functions.DeflateSize(col("t"))).head.getLong(0)
    assert(s1 === s2 && s1 > 0L)
    // NULL passthrough
    assert(Seq(Option.empty[String]).toDF("t")
      .select(graft.functions.DeflateSize(col("t"))).head.isNullAt(0))
  }

  test("extra columns may not collide with battery columns or each other") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Gopher.quality(df, "doc_id", "text", "keep" -> lit(1L))
    }
    intercept[IllegalArgumentException] {
      Gopher.quality(df, "doc_id", "text", "n_words" -> lit(1L))
    }
    intercept[IllegalArgumentException] {
      Gopher.quality(df, "doc_id", "text", "a" -> lit(1L), "a" -> lit(2L))
    }
    // a well-named extra still rides along
    assert(Gopher.quality(df, "doc_id", "text", "sig" -> lit(7L))
      .head.getAs[Long]("sig") === 7L)
  }
}
