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
}
