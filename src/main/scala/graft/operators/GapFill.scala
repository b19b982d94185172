package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: expand each key's sparse observations to a
  * dense bucket grid and forward-fill the gaps — the resampling step in
  * front of any time-series feature pipeline (models want regular grids;
  * events arrive irregularly).
  *
  * Fully relational and key-partitioned: the grid explode is narrow off a
  * tiny per-key bounds aggregate, the join shuffles on (key, bucket), and
  * the forward fill is one keyed window with `last(..., ignoreNulls)` over
  * an unbounded-preceding frame. At 100 TB the cost is grid size (keys ×
  * their bucket spans), never input², and each key's fill sorts only its
  * own span. A key with a multi-year span at 1-second buckets explodes to
  * ~3×10^7 rows — pick the bucket width for the grid you actually want.
  */
object GapFill {

  /** Dense integral-bucket grid per key from each key's min to max bucket
    * (inclusive, step 1), left-joined to the observations and
    * forward-filled: a bucket with no row takes the latest earlier
    * bucket's value. Input must have AT MOST ONE row per (key, bucket) —
    * pre-aggregate multi-observation buckets first (the "last observation
    * per bucket" rule lives with the caller, where the tie-break columns
    * are). The first grid bucket of each key always has an observation
    * (it IS that key's min). An OBSERVED null value stays null — only
    * bucket GAPS are filled (the observation rides in a never-null
    * struct, so the fill can tell the two apart).
    *
    * A violating input (>1 row per (key, bucket)) silently yields
    * duplicated grid rows with tie-order-dependent fill values — set
    * `strict = true` to fail the job instead. The check is a second
    * (key, bucket) window over the (bucket-grained, checkpointed)
    * observations, so its cost is one extra keyed shuffle of the small
    * side, not of the raw input. */
  def forwardFillGrid(df: DataFrame, keyCol: String, bucketCol: String,
                      valueCol: String, strict: Boolean = false): DataFrame = {
    // The observations feed TWO consumers — the per-key bounds aggregate
    // (grid extent) and the grid join — and Spark plans each as its own
    // full subtree: without materialization the caller's (often
    // expensive: dedup window, big scan) observation pipeline executes
    // TWICE. localCheckpoint evaluates it once; the checkpointed set is
    // bucket-grained, far smaller than whatever produced it.
    val checkpointed = df.localCheckpoint()
    // Strict precondition check threaded THROUGH valueCol (not a
    // standalone assert column, which column pruning could silently
    // drop): any consumer of the fill value evaluates the guard.
    val obs = if (!strict) checkpointed else {
      val dupW = Window.partitionBy(col(keyCol), col(bucketCol))
      checkpointed
        .withColumn("__n_dup", count(lit(1)).over(dupW))
        .withColumn(valueCol, when(col("__n_dup") > 1,
            raise_error(format_string(
              "GapFill.forwardFillGrid(strict): %s rows for (%s=%s, %s=%s); expected at most 1",
              col("__n_dup").cast("string"), lit(keyCol), col(keyCol).cast("string"),
              lit(bucketCol), col(bucketCol).cast("string"))))
          .otherwise(col(valueCol)))
        .drop("__n_dup")
    }
    val bounds = obs.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__b0"), max(col(bucketCol)).as("__b1"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__b0"), col("__b1"))).as(bucketCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // the observation value rides inside a never-null struct (the AsOfJoin
    // trick) so the fill distinguishes "bucket has NO row" (struct null ->
    // fill from an earlier bucket) from "bucket OBSERVED a null value"
    // (struct present, value kept null) — a bare last(ignoreNulls) would
    // silently overwrite genuine null observations with stale values
    grid.join(obs.withColumn("__obs", struct(col(valueCol))).drop(valueCol),
        Seq(keyCol, bucketCol), "left")
      .withColumn(valueCol,
        last(col("__obs"), ignoreNulls = true).over(w).getField(valueCol))
      .drop("__obs")
  }
}
