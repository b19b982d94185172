package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus n-gram language-model statistics: token-transition counts and
  * per-head top-k continuations — the "what follows `w1`" table behind
  * vocabulary audits, boilerplate detection, and cheap LM-style corpus
  * diagnostics.
  *
  * Adjacent pairs derive from the token array (one interpreted HOF pass
  * per document — see docBigrams for why that beats the per-doc `lead`
  * window it replaced: the window shuffled every TOKEN row by doc id
  * before anything aggregated). At 100 TB: the explode is narrow, the
  * count aggregates shuffle on (w1, w2) whose cardinality is
  * vocabulary-squared-bounded, the per-doc score aggregate ships one
  * combined row per (partition, doc) — all map-side-combined, none
  * corpus-squared or token-row-shuffled.
  */
object NgramStats {

  /** Per-document bigram OCCURRENCES: one row per adjacent (w1, w2) token
    * pair within a document (cross-document pairs never count), with
    * multiplicity. The shared extraction under [[nextTokenTopK]],
    * [[bigramCounts]] and [[oovBuckets]] — one definition so the LM that
    * trains and the filter that scores see identical pairs.
    *
    * Adjacency comes from the token ARRAY (transform over positions, the
    * `Dedup.wordNgrams` shape), NOT from a per-doc `lead` window: the
    * window formulation forces an Exchange+Sort of every TOKEN row by doc
    * id before anything aggregates — a full-corpus shuffle a 100 TB
    * scoring pass cannot afford — where this is a narrow explode feeding
    * map-side-combined aggregates (pinned in PlanShapeSpec). The token
    * array is bound as a lambda variable (1-element-array trick, see
    * wordNgrams) so the tokenizer regex runs once per document. */
  private def docBigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val empty = array().cast(ArrayType(StructType(Seq(
      StructField("w1", StringType), StructField("w2", StringType)))))
    val pairs = flatten(transform(array(TextAnalysis.tokens(col(textCol))), ts =>
      when(size(ts) >= 2,
        transform(sequence(lit(0), size(ts) - 2),
          i => struct(element_at(ts, i + 1).as("w1"), element_at(ts, i + 2).as("w2"))))
        .otherwise(empty)))
    df.select(col(idCol), explode(pairs).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
  }

  /** The corpus bigram count table (w1, w2, n) — the trained "model" of
    * the bigram LM. A plain DataFrame, so it persists like any table:
    * train once on the reference corpus, write through a
    * `sync.TableStore`, and score arbitrarily many corpora against the
    * stored table without re-reading the reference (the same
    * build/serve split as `Dedup.buildNearDupIndex`). Cardinality is
    * vocabulary²-bounded, map-side combined — never corpus-sized. */
  def bigramCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    docBigrams(df, idCol, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))

  /** Top-`k` continuations of every token: (w1, w2, n, rn) where `n`
    * counts adjacent occurrences of (w1, w2) within a document (across
    * document boundaries pairs do NOT count) and rn = 1..k ranks by
    * (n DESC, w2 ASC) — a total order, so the table is deterministic. */
  def nextTokenTopK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val rank = Window.partitionBy(col("w1")).orderBy(col("n").desc, col("w2"))
    bigramCounts(df, idCol, textCol)
      .withColumn("rn", row_number().over(rank).cast(LongType))
      .filter(col("rn") <= k)
  }

  /** LM-surprise quality partition — the CCNet-style head/middle/tail
    * bucketing (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data") with an INTEGER-EXACT surprise
    * measure: a document's out-of-model rate, the share of its bigram
    * occurrences whose (w1, w2) type never occurs in the reference model
    * (`refBigrams`, a [[bigramCounts]] table, typically persisted). This
    * is the zero-probability mass of the un-smoothed bigram LM — the
    * dominant term of perplexity for out-of-domain text — kept as the
    * exact integer pair (n_oov, n_bigrams) rather than a floating
    * log-prob sum, so the bucketing is bit-identical across engines and
    * replays (float perplexity ranks can flip on last-ulp differences;
    * the engine's cross-engine determinism contract forbids that). The
    * threshold compare multiplies through like the Jaccard gates:
    * head  when n_oov × headDen ≤ n_bigrams × headNum   (rate ≤ head),
    * middle when n_oov × midDen ≤ n_bigrams × midNum    (rate ≤ mid),
    * tail  otherwise.
    *
    * Output: (idCol, n_bigrams, n_oov, bucket) for every scored document
    * with ≥ 1 bigram (sub-2-token docs have no bigram evidence and are
    * not emitted — route them by a length gate instead). Plan shape: one
    * narrow explode of the SCORED corpus, an equi-join against the model
    * table (vocabulary²-bounded — Catalyst broadcasts it when small, the
    * usual case), one per-doc aggregate. The reference corpus is never
    * re-scanned: training is [[bigramCounts]], done once. */
  def oovBuckets(docs: DataFrame, refBigrams: DataFrame, idCol: String,
                 textCol: String,
                 headNum: Int = 1, headDen: Int = 10,
                 midNum: Int = 1, midDen: Int = 2): DataFrame = {
    require(headNum * midDen <= midNum * headDen,
      s"head rate must be <= middle rate, got $headNum/$headDen > $midNum/$midDen")
    // CONTRACT: refBigrams is unique per (w1, w2) — bigramCounts output is
    // by construction (one grouped row per pair). No defensive distinct
    // here: it would shuffle the model table on EVERY scoring call to
    // guard an invariant the trainer already established (a duplicated
    // hand-built model would inflate n_bigrams via join fan-out — dedup
    // it once at build time, not per score).
    val ref = refBigrams.select(col("w1"), col("w2"))
      .withColumn("__seen", lit(1))
    docBigrams(docs, idCol, textCol)
      .join(ref, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("__seen").isNull, 1)).as("n_oov"))
      .withColumn("bucket",
        when(col("n_oov") * headDen <= col("n_bigrams") * headNum, "head")
          .when(col("n_oov") * midDen <= col("n_bigrams") * midNum, "middle")
          .otherwise("tail"))
  }
}
