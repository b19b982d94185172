package graft.text

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // "rare" appears only in doc 1; "the" in all three; "cat" in two
  private val docs = Seq(
    (1L, "the rare cat"),
    (2L, "the cat cat"),
    (3L, "the dog"))
    .toDF("doc_id", "text")

  test("termFrequencies counts within-doc occurrences") {
    val tf = TfIdf.termFrequencies(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tf((2L, "cat")) === 2L)
    assert(tf((1L, "cat")) === 1L)
    assert(tf.keys.count(_._1 == 3L) === 2)
  }

  test("docFrequencies counts DOCUMENTS, not occurrences") {
    val df = TfIdf.docFrequencies(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df === Map("the" -> 3L, "cat" -> 2L, "rare" -> 1L, "dog" -> 1L))
  }

  test("scored: tfidf = tf * (ln((N+1)/(df+1)) + 1), corpus-wide term downweighted") {
    val s = TfIdf.scored(docs, "doc_id", "text", corpusSize = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // StrictMath per the repo-wide pin: Spark's Log evaluates via
    // StrictMath.log and the Math.log intrinsic can differ by an ulp
    val expectRare = 1.0 * (StrictMath.log(4.0 / 2.0) + 1)
    assert(math.abs(s((1L, "rare")) - expectRare) < 1e-12)
    // ubiquitous term: idf = ln(4/4) + 1 = 1 -> tfidf == tf
    assert(math.abs(s((1L, "the")) - 1.0) < 1e-12)
    assert(s((1L, "rare")) > s((1L, "the")))
  }

  test("rarestTokens picks lowest df with token tie-break") {
    val r = TfIdf.rarestTokens(docs, "doc_id", "text", k = 1)
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) === (("rare", 1L, 1L)))
    assert(r(2L) === (("cat", 2L, 2L)))  // cat (df 2) beats the (df 3)
    assert(r(3L) === (("dog", 1L, 1L)))
  }

  // --- BM25 ---

  /** The exact bm25TopK formula, folded in sorted-token order. */
  private def refBm25(terms: Seq[(String, Long, Long, Long)], // (token, tf, df, dl)
                      n: Long, avgdl: Double,
                      k1: Double = 1.2, b: Double = 0.75): Double =
    terms.sortBy(_._1).foldLeft(0.0) { case (acc, (_, tf, df, dl)) =>
      // StrictMath, not math.log: Spark's Log expression evaluates via
      // StrictMath.log, which can sit an ulp from the Math.log intrinsic
      val idf = StrictMath.log(1.0 + (n - df + 0.5) / (df + 0.5))
      acc + idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
    }

  test("bm25TopK matches the hand-computed Okapi score and ranks by it") {
    val out = TfIdf.bm25TopK(docs, "doc_id", "text",
        Seq(("q1", "cat dog")), k = 10, corpusSize = 3)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    val avgdl = 8.0 / 3.0 // the/rare/cat + the/cat/cat + the/dog
    val s1 = refBm25(Seq(("cat", 1L, 2L, 3L)), 3, avgdl)
    val s2 = refBm25(Seq(("cat", 2L, 2L, 3L)), 3, avgdl)
    val s3 = refBm25(Seq(("dog", 1L, 1L, 2L)), 3, avgdl)
    assert(out((("q1", 1L)))._3 === s1)
    assert(out((("q1", 2L)))._3 === s2)
    assert(out((("q1", 3L)))._3 === s3)
    // dog is rarer (df 1 vs 2) and doc 3 shorter: doc 3 ranks first;
    // tf=2 cat beats tf=1 cat
    assert(out((("q1", 3L)))._1 === 1L)
    assert(out((("q1", 2L)))._1 === 2L)
    assert(out((("q1", 1L)))._1 === 3L)
    // n_terms counts MATCHED query terms only
    assert(out.values.map(_._2).toSet === Set(1L))
  }

  test("bm25TopK: exact-twin docs score bit-equal and tie-break by doc id") {
    val twins = Seq(
      (10L, "alpha beta gamma"), (7L, "alpha beta gamma"),
      (3L, "alpha delta epsilon zeta")).toDF("doc_id", "text")
    val out = TfIdf.bm25TopK(twins, "doc_id", "text",
        Seq(("q", "alpha beta")), k = 10, corpusSize = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // identical token multisets => identical sorted fold => EXACT equality
    assert(out(1L)._3 === out(2L)._3)
    assert((out(1L)._1, out(2L)._1) === ((7L, 10L))) // doc-id tie-break
    assert(out(1L)._2 === 2L) // both query terms matched
    assert(out(3L)._2 === 1L) // only alpha
  }

  test("property: bm25TopK scores and ranks equal the full brute-force reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val words = Seq("aa", "bb", "cc", "dd")
    val corpusGen = Gen.listOfN(5,
      Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf(words))))
    val queryGen = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf(words)))
    val prop = Prop.forAll(corpusGen, queryGen) { (toks, qtoks) =>
      val docs = toks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TfIdf.bm25TopK(docs, "doc_id", "text",
          Seq(("q", qtoks.mkString(" "))), k = 5, corpusSize = toks.size)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      // full reference: tf/df/dl/avgdl from scratch, distinct query terms,
      // sorted-token fold, (score DESC, doc ASC) rank
      val n = toks.size.toLong
      val avgdl = toks.map(_.size).sum.toDouble / n
      val dfm = words.map(wd => wd -> toks.count(_.contains(wd)).toLong).toMap
      val scored = toks.zipWithIndex.flatMap { case (ts, i) =>
        val terms = qtoks.distinct.sorted.flatMap { wd =>
          val tf = ts.count(_ == wd).toLong
          if (tf == 0) None else Some((wd, tf, dfm(wd), ts.size.toLong))
        }
        if (terms.isEmpty) None
        else Some((i.toLong, terms.size.toLong, refBm25(terms, n, avgdl)))
      }
      val want = scored.sortBy { case (id, _, s) => (-s, id) }.take(5)
        .zipWithIndex.map { case ((id, nt, s), r) => (r + 1L, id, nt, s) }
      got.sortBy(_._1).toSeq == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("bm25Join broadcast gate: 0/MaxValue skip the probe with identical rows; negatives rejected") {
    val idx = TfIdf.buildBm25Index(docs, "doc_id", "text", corpusSize = 3)
    val q = Seq(("a", "rare cat")).toDF("query_id", "qtext")
    def rows(cap: Long) = TfIdf.bm25Join(idx, "doc_id", q, k = 3,
        maxBroadcastQueries = cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val probed = rows(100000L)
    assert(rows(0L) === probed)             // never-broadcast: same rows
    assert(rows(Long.MaxValue) === probed)  // always-broadcast: same rows
    // the old sign-sentinel is DEAD, not silently inverted
    intercept[IllegalArgumentException] { rows(-1L) }
  }

  test("bm25TopK: duplicate query terms count once; k caps each query independently") {
    val out = TfIdf.bm25TopK(docs, "doc_id", "text",
        Seq(("a", "cat cat cat"), ("b", "the")), k = 1, corpusSize = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.count(_._1 == "a") === 1)
    assert(out.count(_._1 == "b") === 1)
    // "cat cat cat" == "cat": n_terms 1, and the tf=2 doc wins
    val a = out.find(_._1 == "a").get
    assert(a._3 === 2L && a._4 === 1L)
  }
}
