package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF scoring over a document corpus — keyword extraction, relevance
  * weighting, and the rare-term signals a curation pipeline uses (a doc
  * whose "rarest" token is corpus-common is boilerplate; hapax terms spot
  * novel content and OCR noise).
  *
  * Scale design: term frequencies are one (doc, token) hash-agg with
  * map-side combine absorbing the token explosion; document frequencies
  * aggregate the per-doc DISTINCT token explode (tokenSet — so `count` IS
  * the doc count, no count_distinct shuffle of doc ids), producing a
  * vocabulary-sized table that AQE broadcasts into the tf⋈df join from its
  * runtime size. Nothing driver-side except the corpus-count scalar.
  */
object TfIdf {

  /** (id, token, tf): one row per distinct token per document. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** (token, df): number of documents containing the token. The explode is
    * over the per-doc DISTINCT token set, so a plain count aggregates it —
    * never count_distinct over (token, doc) pairs. */
  def docFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextAnalysis.tokenSet(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))

  /** Smoothed idf: ln((N+1)/(df+1)) + 1 — positive even for df=N terms. */
  def idf(df: Column, corpusSize: Long): Column =
    log((lit(corpusSize) + 1).cast("double") / (df + 1)) + 1

  /** (id, token, tf, df, tfidf): the full scored term table. `corpusSize`
    * is taken by value — pass a known count or `docs.count()`; the one
    * scalar is the operator's only driver-side input. */
  def scored(docs: DataFrame, idCol: String, textCol: String,
             corpusSize: Long): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .join(docFrequencies(docs, idCol, textCol), "token")
      .withColumn("tfidf", col("tf") * idf(col("df"), corpusSize))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"))

  /** The k RAREST tokens per document (lowest df, token-string tie-break) —
    * the integer-exact core of tf-idf ranking (for fixed tf, tfidf rank ==
    * ascending df rank), and the hapax/keyword-extraction primitive. One
    * keyed window after the tf⋈df join. */
  def rarestTokens(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("df"), col("token"))
    termFrequencies(docs, idCol, textCol)
      .join(docFrequencies(docs, idCol, textCol), "token")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"))
  }

  /** Okapi BM25 top-k retrieval: for each query string, the `k`
    * highest-scoring documents under
    * `score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with the Lucene-style non-negative idf `ln(1 + (N−df+0.5)/(df+0.5))`
    * — the lexical-retrieval baseline every RAG / retrieval-eval pipeline
    * starts from. Query terms are DISTINCT (standard Okapi for short
    * queries: query term frequency is ignored), tokenized by the SAME
    * [[TextAnalysis.tokens]] expression as the corpus so query and
    * document vocabularies cannot drift.
    *
    * Scale shape: the corpus is scanned ONCE into the (doc, token, tf)
    * table; doc lengths derive from THAT table (sum of tf per doc — no
    * second text scan); the query-term list joins the vocabulary-sized df
    * table and the resulting ≤|query terms| rows broadcast into the tf
    * join, so only postings of query terms survive the scan — an inverted
    * index probe expressed declaratively (persist `termFrequencies` /
    * `docFrequencies` as parquet and re-query without touching the corpus,
    * exactly like the near-dup and ANN index tables). The only per-query
    * shuffle is the (query, doc) score aggregation plus the k-row rank
    * window. Driver-side inputs: the `corpusSize` scalar (precedent:
    * [[scored]]) and one total-token count action.
    *
    * Determinism: per-(query, doc) term contributions fold in SORTED token
    * order via a left `aggregate` over a `sort_array`ed collect — NOT a
    * float `sum()`, whose association order follows arrival order and
    * would let two identical documents score a last-ulp apart within one
    * engine, breaking the (score DESC, doc ASC) tie-break. With the
    * ordered fold, equal token multisets give bit-equal scores, so exact
    * duplicates rank adjacently by doc id on any engine.
    *
    * Returns (query_id, rank, `idCol`, n_terms, score); `score` is a
    * cross-engine float (ln) — grade the integer rank columns and
    * spec-pin the score (the q58 tf-idf precedent). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(String, String)], k: Int, corpusSize: Long,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKIndexed(buildBm25Index(docs, idCol, textCol, corpusSize), idCol,
      queries, k, k1, b)

  /** Persisted BM25 index over a corpus: the three relations (postings,
    * doc lengths, doc frequencies) plus the two scalars every BM25 scorer
    * needs. All three are plain DataFrames — write them through a
    * `sync.TableStore` (or straight to parquet, bucketed by token if
    * query batches are large) and every query batch reuses them WITHOUT
    * touching the corpus text, exactly like the near-dup band index and
    * the ANN index tables. `avgdl` is fixed at build time (the standard
    * BM25 contract: collection statistics are index-time constants, so a
    * given index scores deterministically forever). */
  final case class Bm25Index(postings: DataFrame, // (idCol, token, tf)
                             docLens: DataFrame, // (idCol, dl)
                             docFreqs: DataFrame, // (token, df)
                             corpusSize: Long, avgdl: Double)

  /** Build a [[Bm25Index]] with ONE pass over the corpus text: doc lengths
    * and the total-token scalar both derive from the postings table (sum
    * of tf — never a second text scan). One driver action (the total-token
    * count); `corpusSize` is taken by value (precedent: [[scored]]). */
  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String,
                     corpusSize: Long): Bm25Index = {
    require(corpusSize >= 1, "buildBm25Index: empty corpus")
    val tf = termFrequencies(docs, idCol, textCol)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val total = dl.agg(sum(col("dl"))).head()
    // sum over zero rows is SQL NULL — fail with a diagnosis, not an NPE
    require(!total.isNullAt(0),
      "buildBm25Index: corpus has no tokens (every document tokenized to empty)")
    Bm25Index(tf, dl, docFrequencies(docs, idCol, textCol),
      corpusSize, total.getLong(0).toDouble / corpusSize)
  }

  /** BM25 top-k through a pre-built [[Bm25Index]] — the serving entry
    * point: the corpus text is never touched, the ≤|query terms| (token,
    * df) rows broadcast into the postings join, and only postings of
    * query terms survive the index scan. See [[bm25TopK]] for scoring
    * semantics and the sorted-fold determinism contract. */
  def bm25TopKIndexed(index: Bm25Index, idCol: String,
                      queries: Seq[(String, String)], k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopKIndexed: empty query set")
    val spark = index.postings.sparkSession
    import spark.implicits._
    bm25Join(index, idCol, queries.toDF("query_id", "qtext"), k, k1, b)
  }

  /** BM25 top-k with the query side as a DataFrame of (query_id, qtext) —
    * the batch-join form [[bm25TopKIndexed]] wraps and the per-micro-batch
    * unit a streaming serving loop calls (each batch's queries broadcast
    * into one postings probe; queries never round-trip the driver). */
  def bm25Join(index: Bm25Index, idCol: String, queryDf: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxBroadcastQueries: Long = 100000L): DataFrame = {
    require(k >= 1, s"bm25Join: k must be >= 1, got $k")
    val qterms = queryDf
      .select(col("query_id"),
        explode(array_distinct(TextAnalysis.tokens(col("qtext")))).as("token"))
    // The query-terms relation is |batch queries| x |distinct terms per
    // query| — small for interactive serving, but a bulk re-score batch
    // could push it past the broadcast cap / driver memory. Gate the hint
    // on a BOUNDED probe of the query batch: limit(max+1).count() stops
    // scanning after max+1 rows, so even a 10^9-row re-score batch pays
    // O(max) to learn "too big" (a bare count() would re-execute the
    // whole query-side plan just to pick a hint); oversized batches
    // degrade to a plain shuffle join instead of OOMing. Short-query
    // terms are bounded (tens), so the default admits ~10^5 queries ≈ a
    // few-MB broadcast.
    val qjoined = qterms.join(index.docFreqs, "token")
    // maxBroadcastQueries == 0 is the explicit never-broadcast opt-out;
    // Long.MaxValue is the always-broadcast opt-out for callers whose
    // batch size is bounded BY CONSTRUCTION (the streaming serve path:
    // the probe's extra limit+count job per micro-batch would otherwise
    // dominate interactive batches far below the cap — see bm25Serve).
    // Both skip the probe entirely; a positive cap probes, clamped to
    // the limit() Int domain. Negative values are REJECTED rather than
    // given a sign-sentinel meaning: an earlier revision read <= 0 as
    // never-broadcast and a later one read < 0 as always-broadcast —
    // exactly the silent inversion a require makes impossible.
    require(maxBroadcastQueries >= 0,
      s"bm25Join: maxBroadcastQueries must be >= 0 (0 = never broadcast, " +
        s"Long.MaxValue = always broadcast, else a probed cap), got $maxBroadcastQueries")
    val qdf =
      if (maxBroadcastQueries == 0) qjoined
      else if (maxBroadcastQueries == Long.MaxValue) broadcast(qjoined)
      else {
        val cap = math.min(maxBroadcastQueries, Int.MaxValue - 1L).toInt
        if (queryDf.limit(cap + 1).count() <= cap) broadcast(qjoined) else qjoined
      }

    val idf = log(lit(1.0) +
      ((lit(index.corpusSize) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    val contrib = idf * ((col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(index.avgdl)))))

    val scoredRows = index.postings.join(qdf, "token").join(index.docLens, idCol)
      .select(col("query_id"), col(idCol), col("token"), contrib.as("__c"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        aggregate(sort_array(collect_list(struct(col("token"), col("__c")))),
          lit(0.0), (acc, x) => acc + x.getField("__c")).as("score"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    scoredRows.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol), col("n_terms"), col("score"))
  }
}
