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

  // cross-document maximal duplicated spans: A and B share the 4-token run
  // "a b c d" (two overlapping 3-gram windows on one diagonal, coalesced);
  // C shares only the 3-token "a b c" (below minRun 4); D is too short for
  // any window
  private val dupDocs = Seq(
    (1L, "x1 x2 a b c d x3"),
    (2L, "y1 a b c d y2 y3"),
    (3L, "z1 a b c z2 z3 z4"),
    (4L, "a b"))
    .toDF("doc_id", "text")

  test("duplicatedSpanStats: both pair members lose the maximal run, sub-minRun runs survive") {
    val out = Decontaminate.duplicatedSpanStats(dupDocs, "doc_id", "text",
        k = 3, minRunTokens = 4, maxDocFreq = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(
      1L -> ((7L, 4L)),   // positions 2..5 ("a b c d")
      2L -> ((7L, 4L)),   // positions 1..4
      3L -> ((7L, 0L)),   // 3-token overlap < minRun
      4L -> ((2L, 0L))))
  }

  test("scrubDuplicatedSpans removes exactly the counted positions") {
    val out = Decontaminate.scrubDuplicatedSpans(dupDocs, "doc_id", "text",
        k = 3, minRunTokens = 4, maxDocFreq = 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("x1", "x2", "x3"))
    assert(out(2L) === Seq("y1", "y2", "y3"))
    assert(out(3L) === Seq("z1", "a", "b", "c", "z2", "z3", "z4"))
    assert(out(4L) === Seq("a", "b"))
    val stats = Decontaminate.duplicatedSpanStats(dupDocs, "doc_id", "text",
        k = 3, minRunTokens = 4, maxDocFreq = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    out.foreach { case (id, toks) => assert(toks.length.toLong === stats(id)) }
  }

  test("duplicatedSpanStats: a hotter-than-maxDf gram splits the span at the gate") {
    // E and F share the 6-token "p q r s t u", but the middle gram
    // "r s t" also lives in G (df 3 > maxDf 2) and is gated out of
    // pairing: the run splits into {p q r, q r s} (rt 4, kept) and
    // {s t u} (rt 3, dropped) — the documented gate semantic
    val docs = Seq(
      (1L, "p q r s t u e1"),
      (2L, "f1 p q r s t u"),
      (3L, "g1 g2 r s t g3"))
      .toDF("doc_id", "text")
    val out = Decontaminate.duplicatedSpanStats(docs, "doc_id", "text",
        k = 3, minRunTokens = 4, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 4L, 2L -> 4L, 3L -> 0L))
    // without the gate binding, the full 6-token span goes; G's own
    // 3-token overlap stays below minRun either way
    val ungated = Decontaminate.duplicatedSpanStats(docs, "doc_id", "text",
        k = 3, minRunTokens = 4, maxDocFreq = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ungated === Map(1L -> 6L, 2L -> 6L, 3L -> 0L))
  }

  test("scrubDuplicatedSpansAgainst scrubs the batch side only and never self-matches") {
    val reference = Seq(
      (1L, "x1 x2 a b c d x3"),          // same id as the arrival: must not self-match
      (5L, "r1 r2 r3 q w e r t"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "x1 x2 a b c d x3"),          // only match is itself in the reference
      (6L, "b1 q w e r t b2 b3"))        // shares "q w e r t" with ref doc 5
      .toDF("doc_id", "text")
    val out = Decontaminate.scrubDuplicatedSpansAgainst(batch, reference,
        "doc_id", "text", k = 3, minRunTokens = 4, maxDocFreq = 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out.keySet === Set(1L, 6L))   // batch rows only, reference untouched
    assert(out(1L) === Seq("x1", "x2", "a", "b", "c", "d", "x3"))
    assert(out(6L) === Seq("b1", "b2", "b3"))
  }

  test("scrubDuplicatedSpansAgainstIndex over dupSpanIndexRows equals the direct form") {
    val reference = Seq(
      (5L, "r1 r2 r3 q w e r t"),
      (7L, "z9 a b c d z8 z7"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (6L, "b1 q w e r t b2 b3"),
      (8L, "a b c d x y z"))
      .toDF("doc_id", "text")
    val direct = Decontaminate.scrubDuplicatedSpansAgainst(batch, reference,
        "doc_id", "text", k = 3, minRunTokens = 4, maxDocFreq = 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // the index round-trips through parquet like a real accumulation
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsi").toString
    Decontaminate.dupSpanIndexRows(reference, "doc_id", "text", k = 3)
      .write.parquet(s"$tmp/idx")
    val viaIndex = Decontaminate.scrubDuplicatedSpansAgainstIndex(batch,
        spark.read.parquet(s"$tmp/idx"), "doc_id", "text",
        k = 3, minRunTokens = 4, maxDocFreq = 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaIndex === direct)
    assert(direct(6L) === Seq("b1", "b2", "b3"))
    assert(direct(8L) === Seq("x", "y", "z"))
  }

  test("property: scrubDuplicatedSpans equals the brute-force maximal-run rule") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val k = 2; val minRun = 3
    val docGen = Gen.listOfN(4,
      Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf("aa", "bb"))))
    val prop = Prop.forAll(docGen) { toks =>
      val df = toks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Decontaminate.scrubDuplicatedSpans(df, "doc_id", "text",
          k = k, minRunTokens = minRun, maxDocFreq = 20)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      // brute force: per ordered pair and diagonal, maximal consecutive
      // matching-window runs; rt >= minRun covers both sides
      val grams = toks.map(_.sliding(k).filter(_.size == k).map(_.mkString(" ")).toVector)
      val cov = Array.fill(toks.size)(collection.mutable.Set.empty[Int])
      for (i <- toks.indices; j <- toks.indices if i < j) {
        val matches = for (pa <- grams(i).indices; pb <- grams(j).indices
                           if grams(i)(pa) == grams(j)(pb)) yield (pa, pb)
        matches.groupBy { case (pa, pb) => pa - pb }.foreach { case (_, ms) =>
          val pas = ms.map(_._1).sorted
          val runs = pas.foldLeft(List.empty[List[Int]]) {
            case (acc @ (h :: t), p) if h.nonEmpty && p == h.head + 1 => (p :: h) :: t
            case (acc, p) => List(p) :: acc
          }
          runs.foreach { r =>
            val rt = r.size + k - 1
            if (rt >= minRun) {
              val s = r.min
              (s until s + rt).foreach(cov(i) += _)
              val sb = ms.find(_._1 == s).get._2
              (sb until sb + rt).foreach(cov(j) += _)
            }
          }
        }
      }
      val want = toks.zipWithIndex.map { case (ts, i) =>
        i.toLong -> ts.zipWithIndex.collect { case (t, p) if !cov(i)(p) => t }
      }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("spanGateLoss quantifies the df gate's three loss classes, hand-traced") {
    // H = 24 hot tokens planted everywhere (df 8 > gate 4): its interior
    // 8-gram windows gate out. Docs 0-1 share A(15)+H+B(20) = 59 tokens:
    // exact covers all 59; gated islands [0,21] + [32,58] cover 49 —
    // loss 10 (the interior gap), 169 permille. Docs 2-3 share
    // C(15)+H+D(5) = 44: the D-side island (rt 12 < minRun 20) vanishes —
    // gated 22, loss 22, 500 permille. Docs 4-7 carry H with unique
    // context: their only duplication IS the hot region — exact 24,
    // gated 0, 1000 permille (the gate working as designed).
    val a = (0 until 15).map(i => s"a$i").mkString(" ")
    val h = (0 until 24).map(i => s"h$i").mkString(" ")
    val b = (0 until 20).map(i => s"b$i").mkString(" ")
    val c = (0 until 15).map(i => s"c$i").mkString(" ")
    val d = (0 until 5).map(i => s"d$i").mkString(" ")
    val docs = ((0L to 1L).map(i => (i, s"$a $h $b tail$i")) ++
      (2L to 3L).map(i => (i, s"$c $h $d tail$i")) ++
      (4L to 7L).map(i => (i, s"f$i $h g$i"))).toDF("doc_id", "text")
    val got = Decontaminate.spanGateLoss(docs, "doc_id", "text",
        k = 8, minRunTokens = 20, maxDocFreq = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) === ((59L, 49L, 10L, 169L)))
    assert(got(1L) === ((59L, 49L, 10L, 169L)))
    assert(got(2L) === ((44L, 22L, 22L, 500L)))
    assert(got(3L) === ((44L, 22L, 22L, 500L)))
    (4L to 7L).foreach(i => assert(got(i) === ((24L, 0L, 24L, 1000L))))
    assert(got.size === 8)
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

  test("embedContaminatedIds: scaled twins flag, negations and orthogonals don't, bad embeds inert") {
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f)),
      (102L, Array(0.0f, 0.0f, 0.0f))) // zero-norm benchmark row: must anchor nothing
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(2.5f, 0.0f, 0.0f)),   // scaled twin of 100 -> flag
      (2L, Array(-1.0f, 0.0f, 0.0f)),  // negation of 100 -> clean (cosine -1)
      (3L, Array(0.0f, 0.0f, 1.0f)),   // orthogonal to everything -> clean
      (4L, Array(0.7f, 0.72f, 0.0f)),  // ~45 deg from both axes (cos ~0.71) -> clean at 0.95
      (5L, Array(0.0f, 0.0f, 0.0f)),   // zero-norm corpus row: excluded, never flags
      (6L, Array(0.1f, 3.0f, 0.05f)))  // near-parallel to 101 -> flag
      .toDF("vec_id", "embedding")
    val got = Decontaminate.embedContaminatedIds(corpus, bench,
      "vec_id", "embedding", threshold = 0.95).collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 6L))
    // scrub drops exactly the flagged rows
    val kept = Decontaminate.embedScrub(corpus, bench, "vec_id", "embedding", 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L, 4L, 5L))
  }

  test("embedContaminatedIdsIvf: full probe equals brute force; tight probe catches twins") {
    // a corpus with two well-separated directions so 2 cells split it
    // cleanly, plus the same hazard classes as the brute-force spec
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f)),
      (102L, Array(0.0f, 0.0f, 0.0f))) // zero-norm: must anchor nothing
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(2.5f, 0.0f, 0.0f)),   // scaled twin of 100 -> flag
      (2L, Array(-1.0f, 0.0f, 0.0f)),  // negation -> clean
      (3L, Array(0.0f, 0.0f, 1.0f)),   // orthogonal -> clean
      (4L, Array(0.7f, 0.72f, 0.0f)),  // cos ~0.71 -> clean at 0.95
      (5L, Array(0.0f, 0.0f, 0.0f)),   // zero-norm: excluded
      (6L, Array(0.1f, 3.0f, 0.05f)),  // near-parallel to 101 -> flag
      (7L, Array(0.98f, 0.02f, 0.0f))) // near-twin of 100 -> flag
      .toDF("vec_id", "embedding")
    val brute = Decontaminate.embedContaminatedIds(corpus, bench,
      "vec_id", "embedding", 0.95).collect().map(_.getLong(0)).toSet
    val index = graft.similarity.Similarity.ivfIndex(corpus, "vec_id",
      "embedding", numCentroids = 2)
    // full probe: identical id set to brute force (the q113 degeneracy)
    val full = Decontaminate.embedContaminatedIdsIvf(index, bench,
      "vec_id", "embedding", 0.95, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(full === brute)
    assert(full === Set(1L, 6L, 7L))
    // tight probe: the scaled twin rides scale-invariant assignment into
    // its source's top cell — nprobe = 1 must still flag it
    val tight = Decontaminate.embedContaminatedIdsIvf(index, bench,
      "vec_id", "embedding", 0.95, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(tight.contains(1L))
    assert(tight.subsetOf(brute)) // probing fewer cells can only lose flags
    // the one-shot overload trains its own cells and agrees at full probe
    val oneShot = Decontaminate.embedContaminatedIdsIvf(corpus, bench,
      "vec_id", "embedding", 0.95, numCells = 2, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(oneShot === brute)
  }
}
