package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset curation operators for training-data pipelines: deterministic
  * splits and per-group caps.
  *
  * Both are narrow/one-shuffle plans: the split is a pure hash expression
  * (no shuffle at all — splits can be computed inline in any scan), the cap
  * is one keyed window shuffle. Neither uses rand(): every decision is a
  * function of the DATA, so re-running on a grown corpus keeps previous
  * rows in their previous split (stable membership — the property cluster
  * re-runs at 100 TB actually need; rand() would reshuffle everything and
  * leak test documents into training between runs).
  */
object Sampling {

  /** Deterministic split bucket in [0, 100) from a stable id column —
    * xxhash64-based, uncorrelated with id magnitude or insertion order
    * (plain `id % 100` biases against range-partitioned or striped ids). */
  def splitBucket(idCol: Column): Column = pmod(xxhash64(idCol), lit(100))

  /** Tag each row 'train'/'test' with ~trainPct% in train — stable under
    * corpus growth (a row's split never changes when other rows appear). */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int,
                splitCol: String = "split"): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct in (0,100), got $trainPct")
    df.withColumn(splitCol,
      when(splitBucket(col(idCol)) < trainPct, lit("train")).otherwise(lit("test")))
  }

  /** Keep at most `n` rows per key, chosen by `order` (deterministic — make
    * it a total order within a key or ties pick arbitrarily): the
    * "at most N documents per source/domain" curation cap. One keyed window
    * shuffle; skew-bounded by the hottest key. */
  def capPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
