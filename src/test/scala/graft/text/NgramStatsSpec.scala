package graft.text

import graft.SparkSpec

class NgramStatsSpec extends SparkSpec {
  import spark.implicits._

  test("nextTokenTopK counts in-document adjacencies and ranks per head") {
    val docs = Seq(
      (1L, "a b a b a c"),   // a->b ×2, b->a ×2, a->c ×1
      (2L, "a b c")).toDF("doc_id", "text") // a->b, b->c
    val out = NgramStats.nextTokenTopK(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set(
      ("a", "b", 3L, 1L), ("a", "c", 1L, 2L),
      ("b", "a", 2L, 1L), ("b", "c", 1L, 2L)))
  }

  test("pairs never span document boundaries") {
    val docs = Seq((1L, "x y"), (2L, "z w")).toDF("doc_id", "text")
    val heads = NgramStats.nextTokenTopK(docs, "doc_id", "text", 3)
      .collect().map(_.getString(0)).toSet
    // y->z would only appear if doc 1's tail paired with doc 2's head
    assert(heads === Set("x", "z"))
  }

  test("k bounds the continuations per head, ties broken by w2 asc") {
    val docs = Seq((1L, "h a h b h c h a h b h c")).toDF("doc_id", "text")
    // h->a, h->b, h->c each twice (plus a->h etc.); k=2 keeps a, b by tie-break
    val hs = NgramStats.nextTokenTopK(docs, "doc_id", "text", 2)
      .filter($"w1" === "h").collect()
      .sortBy(_.getLong(3)).map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(hs === Seq(("a", 2L, 1L), ("b", 2L, 2L)))
  }

  test("single-token and empty docs contribute nothing") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "p q")).toDF("doc_id", "text")
    val out = NgramStats.nextTokenTopK(docs, "doc_id", "text", 3).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet === Set(("p", "q")))
  }

  test("oovBuckets: integer-exact rates, inclusive boundaries, sub-2-token docs absent") {
    val ref = Seq((0L, "a b a b"), (1L, "b c")).toDF("doc_id", "text")
    val lm = NgramStats.bigramCounts(ref, "doc_id", "text") // types: ab, ba, bc
    val docs = Seq(
      // 10 bigrams (ab x5, ba x4, bz x1), 1 oov (bz): rate 1/10 — EXACTLY
      // the head boundary, inclusive (the q-gate convention: <=,
      // multiplied through)
      (10L, "a b a b a b a b a b z"),
      // 2 bigrams (bc, ca), 1 oov (ca): rate 1/2 — exactly the middle boundary
      (11L, "b c a"),
      // 3 bigrams, all oov: tail
      (12L, "x y z w"),
      // 0 bigrams: not emitted
      (13L, "solo"),
      // all bigrams in-model: head
      (14L, "a b c")).toDF("doc_id", "text")
    val out = NgramStats.oovBuckets(docs, lm, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out === Map(
      10L -> ((10L, 1L, "head")),
      11L -> ((2L, 1L, "middle")),
      12L -> ((3L, 3L, "tail")),
      14L -> ((2L, 0L, "head"))))
  }

  test("oovBuckets counts OCCURRENCES against model TYPES (multiplicity on the doc side only)") {
    val ref = Seq((0L, "a b a b a b")).toDF("doc_id", "text") // types: ab (x3), ba (x2)
    val docs = Seq((1L, "a b a b z z")).toDF("doc_id", "text")
    // doc bigrams: ab, ba, ab, bz, zz -> 5 occurrences; oov: bz, zz = 2
    // (ba IS a model type — the ref's own internal adjacency counts)
    val out = NgramStats.oovBuckets(docs, ref
        .transform(d => NgramStats.bigramCounts(d, "doc_id", "text")),
      "doc_id", "text").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((1L, 5L, 2L)))
  }

  test("oovBuckets rejects a head rate looser than the middle rate") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val lm = NgramStats.bigramCounts(df, "doc_id", "text")
    intercept[IllegalArgumentException] {
      NgramStats.oovBuckets(df, lm, "doc_id", "text",
        headNum = 3, headDen = 4, midNum = 1, midDen = 2)
    }
  }
}
