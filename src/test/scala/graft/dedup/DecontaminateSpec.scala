package graft.dedup

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // benchmark doc 100 shares a verbatim 5-token run with corpus doc 1;
  // corpus doc 2 shares only 4 consecutive tokens (one flip); doc 3 is
  // disjoint; doc 4 is shorter than n and can never collide
  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta XXX zeta"),
    (3L, "one two three four five six"),
    (4L, "alpha beta"))
    .toDF("doc_id", "text")
  private val benchmark = Seq(
    (100L, "prefix alpha beta gamma delta epsilon suffix"))
    .toDF("doc_id", "text")

  test("contaminatedIds flags exactly the docs sharing a full n-gram") {
    val ids = Decontaminate.contaminatedIds(corpus, benchmark, "doc_id", "text", n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L)) // doc 2's 5-grams all straddle the XXX flip
  }

  test("scrub keeps every non-contaminated doc with all its columns") {
    val kept = Decontaminate.scrub(corpus, benchmark, "doc_id", "text", n = 5)
    assert(kept.columns.toSeq === corpus.columns.toSeq)
    assert(kept.collect().map(_.getLong(0)).toSet === Set(2L, 3L, 4L))
  }

  test("a lower n is stricter: 4-gram containment also catches the near-copy") {
    val ids = Decontaminate.contaminatedIds(corpus, benchmark, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L)) // "alpha beta gamma delta" survives the flip
  }

  test("empty benchmark contaminates nothing") {
    val ids = Decontaminate.contaminatedIds(
      corpus, benchmark.filter($"doc_id" < 0), "doc_id", "text", n = 5)
    assert(ids.count() === 0)
  }

  test("contaminatedIdsStream matches the batch gate, one row per doc") {
    import org.apache.spark.sql.functions.{lit, timestamp_micros}
    val src = java.nio.file.Files.createTempDirectory("graft_dc_src").toString
    corpus.coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(corpus.schema).parquet(s"$src/*.parquet")
    // n=4: doc 1 shares TWO benchmark 4-grams, so the watermarked distinct
    // is load-bearing (without it doc 1 would emit twice); doc 2 shares one.
    // Day-1 arrival, NOT epoch 0 — the scaladoc'd late-filter pitfall
    val out = Decontaminate.contaminatedIdsStream(stream, benchmark, "doc_id", "text",
      eventTimeCol = timestamp_micros(lit(86400000000L)), n = 4)
    val q = out.writeStream.format("memory").queryName("dc_stream_sink")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dc_stream_sink").collect().map(_.getLong(0)).sorted.toSeq
    spark.catalog.dropTempView("dc_stream_sink")
    assert(got === Seq(1L, 2L))
    assert(got === Decontaminate.contaminatedIds(corpus, benchmark, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("scrub and contaminatedIds partition the corpus exactly") {
    val flagged = Decontaminate.contaminatedIds(corpus, benchmark, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    val kept = Decontaminate.scrub(corpus, benchmark, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert((flagged intersect kept).isEmpty)
    assert((flagged union kept) ===
      corpus.collect().map(_.getLong(0)).toSet)
  }

  test("contaminatedSpanStats: overlapping windows union, clean and short docs at zero") {
    // n=4 against the benchmark: doc 1 has contaminated 4-gram windows at
    // token positions 0 and 1 (alpha-beta-gamma-delta, beta-gamma-delta-
    // epsilon) — overlapping, covering tokens 0..4 = 5 positions, NOT 8;
    // doc 2 only the window at 0 (XXX breaks the second) = 4 positions;
    // doc 3 is clean; doc 4 (2 tokens) can hold no window
    val out = Decontaminate.contaminatedSpanStats(corpus, benchmark, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(
      1L -> ((6L, 5L)),
      2L -> ((6L, 4L)),
      3L -> ((6L, 0L)),
      4L -> ((2L, 0L))))
  }

  test("scrubSpans removes exactly the covered tokens, keeps clean docs whole") {
    val out = Decontaminate.scrubSpans(corpus, benchmark, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("zeta"))                     // tokens 0..4 removed
    assert(out(2L) === Seq("xxx", "zeta"))              // tokens 0..3 removed
    assert(out(3L) === Seq("one", "two", "three", "four", "five", "six"))
    assert(out(4L) === Seq("alpha", "beta"))
    // the span accounting and the scrub agree: removed = n_tokens - kept
    val stats = Decontaminate.contaminatedSpanStats(corpus, benchmark, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    out.foreach { case (id, toks) => assert(toks.length.toLong === stats(id)) }
  }

  test("selfScrubSpans removes globally duplicated passages, keeps unique text") {
    val boiler = "copyright notice all rights reserved by the site"  // 8 tokens
    val docs = Seq(
      (1L, s"unique alpha content here $boiler"),
      (2L, s"$boiler other beta content entirely"),
      (3L, "fully unique gamma document with no duplication at all"))
      .toDF("doc_id", "text")
    val out = Decontaminate.selfScrubSpans(docs, "doc_id", "text", n = 8, maxDf = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("unique", "alpha", "content", "here"))
    assert(out(2L) === Seq("other", "beta", "content", "entirely"))
    assert(out(3L) === "fully unique gamma document with no duplication at all".split(" ").toSeq)
  }

  test("property: selfScrubSpans equals the brute-force global-duplicate rule") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = Gen.listOfN(4,
      Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc"))))
    val n = 3
    val prop = Prop.forAll(docGen) { toks =>
      val df = toks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Decontaminate.selfScrubSpans(df, "doc_id", "text", n = n, maxDf = 1)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      // reference: gram -> distinct docs; windows of hot grams cover positions
      val grams = toks.zipWithIndex.flatMap { case (ts, i) =>
        ts.sliding(n).filter(_.size == n).zipWithIndex.map { case (g, p) => (i, p, g.mkString(" ")) }
      }
      val hot = grams.map { case (i, _, g) => (i, g) }.distinct
        .groupBy(_._2).filter(_._2.size > 1).keySet
      val want = toks.zipWithIndex.map { case (ts, i) =>
        val cov = grams.filter { case (d, _, g) => d == i && hot(g) }
          .flatMap { case (_, p, _) => p until p + n }.toSet
        i.toLong -> ts.zipWithIndex.collect { case (t, j) if !cov(j) => t }
      }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("selfScrubSpans: maxDf tolerates passages up to the gate; exact twins scrub empty") {
    val passage = "shared passage of exactly eight tokens here now"
    val docs = Seq(
      (1L, s"one $passage"), (2L, s"two $passage"),
      (10L, "twin document with identical content of eight tokens"), // 8 tokens
      (11L, "twin document with identical content of eight tokens"))
      .toDF("doc_id", "text")
    // df gate 2: the passage shared by exactly 2 docs SURVIVES...
    val tolerant = Decontaminate.selfScrubSpans(docs, "doc_id", "text", n = 8, maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(tolerant(1L).size === 9 && tolerant(2L).size === 9)
    // ...and the twins (df 2) survive too at maxDf = 2, but scrub to
    // EMPTY at the default gate — the documented whole-duplicate effect
    assert(tolerant(10L).size === 8)
    val strict = Decontaminate.selfScrubSpans(docs, "doc_id", "text", n = 8, maxDf = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(strict(10L).isEmpty && strict(11L).isEmpty)
    assert(strict(1L) === Seq("one") && strict(2L) === Seq("two"))
  }
}
