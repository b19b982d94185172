package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — temporal proximity pairs at scale.
  *
  * The naive formulation (`a JOIN b ON key AND |ta - tb| <= w`) is an
  * inequality join: Spark plans it as a per-key cross join — O(n²) in the
  * hottest key, dead at 100 TB. The banded plan quantizes time into
  * `window`-sized buckets: a pair within `window` can only straddle
  * adjacent buckets, so the EARLIER side is exploded into (its bucket,
  * bucket+1) and the join becomes a plain equi-join on (key, bucket) whose
  * cost tracks real temporal density — rows per bucket — never n². The
  * exact window predicate then filters band false positives. Same
  * candidates-then-verify shape as the LSH dedup joins.
  */
object RangeJoin {

  /** All pairs within the same key group whose times differ by at most
    * `window` (inclusive), each pair emitted EXACTLY once, oriented by
    * (time, id) lexicographic order: output rows are (keys..., id_a, t_a,
    * id_b, t_b) with (t_a, id_a) < (t_b, id_b) and t_b - t_a <= window.
    * Time and id columns must be integral (bigint); `window` > 0.
    *
    * Exactly-once proof: the earlier row occupies buckets {f, f+1} (f =
    * t_a div window, distinct values), the later row exactly bucket
    * t_b div window ∈ {f, f+1} — one band key matches, never two. */
  def pairsWithin(df: DataFrame, keys: Seq[String], timeCol: String,
                  idCol: String, window: Long): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    def bucket: Column = expr(s"`$timeCol` div ${window}L")
    val later = df.select(
      keys.map(col) ++ Seq(bucket.as("__bk"),
        col(idCol).as("id_b"), col(timeCol).as("t_b")): _*)
    val earlier = df.select(
      keys.map(col) ++ Seq(explode(array(bucket, bucket + 1)).as("__bk"),
        col(idCol).as("id_a"), col(timeCol).as("t_a")): _*)
    earlier.join(later, keys :+ "__bk")
      .filter(col("t_a") < col("t_b")
        || (col("t_a") === col("t_b") && col("id_a") < col("id_b")))
      .filter(col("t_b") - col("t_a") <= window)
      .select(keys.map(col) ++ Seq(col("id_a"), col("t_a"), col("id_b"), col("t_b")): _*)
  }
}
