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

  /** 2D box join: all pairs (within each key group; pass no keys for a
    * global join) with x_b - x_a in [0, xWindow] under (x, id) pair
    * orientation AND |y_a - y_b| <= yWindow — the proximity-join shape
    * (temporal + amount, 2D coordinates, …) whose naive form is an
    * unhashable two-inequality cross join.
    *
    * Grid-cell blocking generalizes the 1D banding: both dims quantize to
    * window-sized cells; orientation makes the later-in-x row land in
    * x-bucket {fx, fx+1} of the earlier, while y is unoriented so the
    * earlier row explodes into y-buckets {gy-1, gy, gy+1} — 2×3 = 6 cells
    * per build row against the probe row's exact cell. Exactly one x band
    * and one y band can match a qualifying pair, so each pair is emitted
    * EXACTLY once — no distinct. Cost tracks 2D cell density, never n².
    *
    * Negative coordinates are safe: Spark's `div` truncates toward zero,
    * which widens the zero-straddling bucket to 2w-1 — bucket boundaries
    * stay >= w apart, so a within-w pair still crosses at most one
    * boundary and the {f, f+1} / {g-1, g, g+1} membership holds.
    * Coordinate and id columns must be integral (bigint). */
  def boxPairsWithin(df: DataFrame, keys: Seq[String], xCol: String, yCol: String,
                     idCol: String, xWindow: Long, yWindow: Long): DataFrame = {
    require(xWindow > 0 && yWindow > 0,
      s"windows must be positive, got ($xWindow, $yWindow)")
    def bx: Column = expr(s"`$xCol` div ${xWindow}L")
    def by: Column = expr(s"`$yCol` div ${yWindow}L")
    val probe = df.select(
      keys.map(col) ++ Seq(bx.as("__bx"), by.as("__by"),
        col(idCol).as("id_b"), col(xCol).as("x_b"), col(yCol).as("y_b")): _*)
    val build = df.select(
        keys.map(col) ++ Seq(explode(array(bx, bx + 1)).as("__bx"), by.as("__gy"),
          col(idCol).as("id_a"), col(xCol).as("x_a"), col(yCol).as("y_a")): _*)
      .select(
        keys.map(col) ++ Seq(col("__bx"),
          explode(array(col("__gy") - 1, col("__gy"), col("__gy") + 1)).as("__by"),
          col("id_a"), col("x_a"), col("y_a")): _*)
    build.join(probe, keys ++ Seq("__bx", "__by"))
      .filter(col("x_a") < col("x_b")
        || (col("x_a") === col("x_b") && col("id_a") < col("id_b")))
      .filter(col("x_b") - col("x_a") <= xWindow
        && abs(col("y_a") - col("y_b")) <= yWindow)
      .select(keys.map(col) ++ Seq(col("id_a"), col("x_a"), col("y_a"),
        col("id_b"), col("x_b"), col("y_b")): _*)
  }
}
