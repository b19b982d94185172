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
  * Fully relational — posexplode + a per-doc `lead` window + two keyed
  * aggregations — instead of per-document higher-order lambdas (Spark
  * evaluates HOFs interpreted; see TextAnalysis.distinctNgramCount's
  * history). At 100 TB: the explode is narrow, the lead window shuffles
  * on doc id (bounded by the longest document), the count aggregates
  * shuffle on (w1, w2) whose cardinality is vocabulary-squared-bounded —
  * all map-side-combined, none corpus-squared.
  */
object NgramStats {

  /** Top-`k` continuations of every token: (w1, w2, n, rn) where `n`
    * counts adjacent occurrences of (w1, w2) within a document (across
    * document boundaries pairs do NOT count) and rn = 1..k ranks by
    * (n DESC, w2 ASC) — a total order, so the table is deterministic. */
  def nextTokenTopK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val perDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val pairs = df
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol))))
      .select(col(idCol), col("pos"), col("col").as("w1"))
      .withColumn("w2", lead(col("w1"), 1).over(perDoc))
      .filter(col("w2").isNotNull)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
    val rank = Window.partitionBy(col("w1")).orderBy(col("n").desc, col("w2"))
    pairs
      .withColumn("rn", row_number().over(rank).cast(LongType))
      .filter(col("rn") <= k)
  }
}
