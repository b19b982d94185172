package graft.dedup

import graft.SparkSpec

class PassageDedupSpec extends SparkSpec {
  import spark.implicits._

  // docs 0/1 share the 6-token passage "one two three four five six" embedded
  // in otherwise-disjoint text; doc 2 shares only a 3-token overlap with 0;
  // doc 3 is disjoint from everything
  private val docs = Seq(
    (0L, "alpha beta one two three four five six gamma delta"),
    (1L, "zeta eta theta one two three four five six iota"),
    (2L, "one two three kappa lambda mu nu xi omicron pi"),
    (3L, "rho sigma tau upsilon phi chi psi omega aa bb"))
    .toDF("doc_id", "text")

  test("passagePairs finds the exact longest shared token run") {
    val out = Dedup.passagePairs(docs, "doc_id", "text",
        k = 3, minRunTokens = 4, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 0-1 share exactly 6 consecutive tokens; 0-2's 3-token overlap is under
    // minRunTokens=4 and must not appear
    assert(out === Map((0L, 1L) -> 6L))
  }

  test("run extension does not bridge a gap between two shared passages") {
    val d = Seq(
      (10L, "a b c d x e f g h"),
      (11L, "a b c d y e f g h"))
      .toDF("doc_id", "text")
    val out = Dedup.passagePairs(d, "doc_id", "text",
        k = 2, minRunTokens = 3, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // two separate 4-token runs ("a b c d", "e f g h") on DIFFERENT
    // diagonals — the longest single run is 4, not 8
    assert(out === Map((10L, 11L) -> 4L))
  }

  test("doc-frequency gate drops boilerplate grams above the cap") {
    // the same 4-token passage in ALL four docs; cap=3 excludes its grams,
    // so no pair survives even though every pair shares 4 tokens
    val d = (0L to 3L).map(i => (i, s"boiler plate line here tail$i"))
      .toDF("doc_id", "text")
    val capped = Dedup.passagePairs(d, "doc_id", "text",
      k = 3, minRunTokens = 3, maxDocFreq = 3)
    assert(capped.count() === 0L)
    val uncapped = Dedup.passagePairs(d, "doc_id", "text",
      k = 3, minRunTokens = 3, maxDocFreq = 10)
    assert(uncapped.count() === 6L) // all C(4,2) pairs, run 4
  }

  test("passageDupStats counts gram totals and cross-doc duplicated grams") {
    val out = Dedup.passageDupStats(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every doc has 10 tokens -> 8 trigram positions
    assert(out.keySet === Set(0L, 1L, 2L, 3L))
    assert(out.values.forall(_._1 === 8L))
    // 0 and 1 share the 6-token passage -> 4 shared trigrams ("one two
    // three" among them is ALSO in doc 2, which doesn't add a new gram)
    assert(out(0L)._2 === 4L)
    assert(out(1L)._2 === 4L)
    assert(out(2L)._2 === 1L)
    assert(out(3L)._2 === 0L)
  }

  test("docs shorter than k tokens emit no grams and no pairs") {
    val d = Seq((20L, "a b"), (21L, "a b")).toDF("doc_id", "text")
    assert(Dedup.passagePairs(d, "doc_id", "text", k = 3, minRunTokens = 3).count() === 0L)
    assert(Dedup.passageDupStats(d, "doc_id", "text", k = 3).count() === 0L)
  }

  test("property: passagePairs equals brute-force longest common token run") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny vocab forces frequent shared runs; maxDocFreq = numDocs so the
    // df gate only drops singleton grams (which cannot form a pair anyway)
    val docGen = Gen.listOfN(4,
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))))
    def lcr(a: Seq[String], b: Seq[String]): Int = {
      var best = 0
      for (i <- a.indices; j <- b.indices) {
        var l = 0
        while (i + l < a.length && j + l < b.length && a(i + l) == b(j + l)) l += 1
        if (l > best) best = l
      }
      best
    }
    val prop = Prop.forAll(docGen) { toks =>
      val df = toks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.passagePairs(df, "doc_id", "text",
          k = 3, minRunTokens = 3, maxDocFreq = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = (for {
        i <- toks.indices; j <- toks.indices if i < j
        run = lcr(toks(i), toks(j)) if run >= 3
      } yield (i.toLong, j.toLong) -> run.toLong).toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
