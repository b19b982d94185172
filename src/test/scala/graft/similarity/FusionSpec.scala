package graft.similarity

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def rk(rows: (String, Long, Long)*) =
    rows.toSeq.toDF("query_id", "doc_id", "rank")

  test("rrf sums reciprocal ranks across sources, exact doubles") {
    val lex = rk(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
    val vec = rk(("q", 2L, 1L), ("q", 1L, 2L), ("q", 4L, 3L))
    val out = Fusion.rrf(Seq(("lex", lex), ("vec", vec)), "doc_id",
        k0 = 60, topK = 10)
      .collect().map(r => r.getLong(2) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    // both-source docs: the exact two-term sum in source order
    assert(out(1L)._3 === 1.0 / 61 + 1.0 / 62)
    assert(out(2L)._3 === 1.0 / 62 + 1.0 / 61)
    assert(out(1L)._3 === out(2L)._3) // commutative addition: EXACT tie
    // ...broken by doc id
    assert((out(1L)._1, out(2L)._1) === ((1L, 2L)))
    assert(out(1L)._2 === 2L && out(3L)._2 === 1L)
    assert(out(3L)._3 === 1.0 / 63)
  }

  test("rrf ranks both-source docs above single-source, caps at topK") {
    val lex = rk(("q", 1L, 1L), ("q", 2L, 2L))
    val vec = rk(("q", 2L, 1L), ("q", 3L, 2L))
    val out = Fusion.rrf(Seq(("lex", lex), ("vec", vec)), "doc_id", topK = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // doc 2 appears in both -> fused first; only topK rows survive
    assert(out.sortBy(_._1).toSeq === Seq((1L, 2L), (2L, 1L)))
  }

  test("rrf rejects duplicate source names and empty input") {
    val df = rk(("q", 1L, 1L))
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq(("s", df), ("s", df)), "doc_id")
    }
    intercept[IllegalArgumentException] { Fusion.rrf(Seq.empty, "doc_id") }
  }

  test("recallAtK counts reference hits, zero-scores dropped queries") {
    val want = rk(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 7L, 1L), ("c", 9L, 1L))
    val got = rk(("a", 2L, 1L), ("a", 5L, 2L), ("a", 1L, 4L), // 1 past k
      ("b", 7L, 1L), ("d", 1L, 1L)) // d has no reference: ignored
    val out = Fusion.recallAtK(got, want, "doc_id", k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") === ((3L, 1L, 1.0 / 3))) // only doc 2 within k on both sides
    assert(out("b") === ((1L, 1L, 1.0)))
    assert(out("c") === ((1L, 0L, 0.0))) // query dropped by got entirely
    assert(!out.contains("d"))
    // perfect self-recall
    val self = Fusion.recallAtK(want, want, "doc_id", k = 3).collect()
    assert(self.forall(_.getDouble(3) === 1.0))
    // duplicate rows (a re-arrived query in a serving log) must not
    // inflate n_want/n_hit — distinct on both sides
    val dup = got.union(got)
    val out2 = Fusion.recallAtK(dup, want.union(want), "doc_id", k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out2 === out)
  }

  test("knnJoinRanked carries the knnJoin ordering as 1-based ranks") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0.6f, 0.8f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.knnJoinRanked(emb.filter($"vec_id" === 0L), emb,
        "vec_id", "embedding", k = 3)
      .collect().map(x => (x.getLong(1), x.getLong(2))).sortBy(_._2).toSeq
    assert(r === Seq((1L, 1L), (2L, 2L), (3L, 3L))) // self excluded
    // parity with the unranked join
    val plain = Similarity.knnJoin(emb.filter($"vec_id" === 0L), emb,
        "vec_id", "embedding", k = 3)
      .collect().map(x => x.getLong(1)).toSet
    assert(r.map(_._1).toSet === plain)
  }
}
