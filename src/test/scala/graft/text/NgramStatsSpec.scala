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
}
