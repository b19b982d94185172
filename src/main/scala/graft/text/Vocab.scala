package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-truncated vocabulary + token-id encoding — the last step of a
  * text pipeline before tensors: map each token to a dense integer id from
  * a persisted top-N vocabulary, unknown tokens to the reserved OOV id 0.
  * The vocabulary is a plain (token, token_id) DataFrame: persist it like
  * any index artifact and every encode run (batch or serving) uses the
  * identical mapping — ids are training-run constants, the same
  * build-once/serve-many contract as the BM25 and near-dup indexes.
  */
object Vocab {

  /** Top-`topN` vocabulary by corpus frequency: (token, n, token_id) with
    * ids 1..topN assigned by (count DESC, token ASC) — a total integer
    * order, so the table is deterministic and cross-engine reproducible
    * even through count ties at the truncation boundary. Id 0 is RESERVED
    * for OOV and never assigned.
    *
    * Scale shape: one partial-aggregated token count (map-side combine
    * absorbs the Zipf head), a TakeOrdered top-N (per-partition heaps, N
    * rows), then a rank over the N retained rows — the single-partition
    * window is deliberate and vocab-sized, never corpus-sized. */
  def build(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"Vocab.build: topN must be >= 1, got $topN")
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(topN)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
  }

  /** Encode every document to its token-id array: (idCol, ids), OOV → 0.
    * The vocabulary rides as ONE map literal (bounded by topN — the
    * centroid-literal pattern, q134), so encoding is a narrow codegen'd
    * projection: no explode, no join, no shuffle — at 100 TB the corpus
    * is scanned once and nothing else moves. Literal-map lookup is linear
    * in vocab size per token; beyond ~100k entries switch to the
    * explode + broadcast-join + re-collect formulation instead (one
    * doc-keyed shuffle buys O(1) probes). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame): DataFrame =
    encodeWith(docs, idCol, textCol, collectVocab(vocab))

  /** Collect a (token, token_id) vocabulary table to the driver-side map
    * [[encodeWith]] consumes — bounded by topN, validated once. */
  def collectVocab(vocab: DataFrame): Map[String, Long] = {
    val entries = vocab.select(col("token"), col("token_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(entries.nonEmpty, "Vocab: empty vocabulary table")
    require(!entries.valuesIterator.contains(0L),
      "Vocab: token_id 0 is reserved for OOV")
    entries
  }

  /** The encode core over a pre-collected vocabulary map — the per-micro-
    * batch unit of the streaming gate (collect once at query start, not
    * per batch: token ids are TRAINING-RUN CONSTANTS, so a gate must pin
    * its vocabulary for the lifetime of the table it accumulates). */
  def encodeWith(docs: DataFrame, idCol: String, textCol: String,
                 entries: Map[String, Long]): DataFrame = {
    val m = typedLit(entries)
    docs.select(col(idCol),
      transform(TextAnalysis.tokens(col(textCol)),
        t => coalesce(element_at(m, t), lit(0L))).as("ids"))
  }
}
