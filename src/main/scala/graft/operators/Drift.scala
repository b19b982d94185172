package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Snapshot-to-snapshot DRIFT reporting — the monitoring pass a corpus
  * pipeline runs between crawls (or a sync tool runs between nightly
  * loads) before re-training on the new data: per histogram bucket or
  * category, how did the distribution move? A silent upstream change
  * (a crawler losing a domain, a source flipping encodings, a schema
  * default changing) shows up as a share shift long before it shows up
  * as a model regression. The between-runs companion of
  * [[Expectations]] (assertions about ONE table) and [[Profile]]
  * (a one-shot summary): drift needs two snapshots and reports movement.
  *
  * EVERYTHING integer: counts are exact, shares are permille floors
  * (floor(1000·n / total), both engines' integer division), shift is
  * the absolute permille delta — so the report grades cross-engine
  * exactly (q195) and thresholding it ("alert at 50 permille") is
  * deterministic. Callers wanting PSI/KL feed these exact counts to
  * their own float formula — the operator's contract stops at what can
  * be bit-reproduced.
  *
  * Plan shape: one partial-aggregated count per snapshot (map-side
  * combine; the exchange carries distinct keys only), a full-outer join
  * of the two BUCKET-SIZED count tables, and the totals via a window
  * over those same bounded rows (#buckets/#categories — output-sized,
  * never corpus-sized; this is NOT the q162 corpus-window shape). Each
  * snapshot is scanned exactly once. */
object Drift {

  /** Fixed-width histogram drift over an INTEGER column (callers
    * integerize floats first — cents via round(x·100) — the
    * [[Stats.histogram]] convention, same truncating `div` bucketing).
    * Output: (bucket, n_old, n_new, share_old_pm, share_new_pm,
    * shift_pm), one row per bucket present in EITHER snapshot, absent
    * side counted 0. An EMPTY snapshot reports its shares as 0 (the
    * when-guard; integer division by zero would NULL in Spark and error
    * in DuckDB — neither is a report). */
  def histogramDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
                     width: Long): DataFrame = {
    require(width > 0, s"Drift.histogramDrift: width must be positive, got $width")
    val base = drift(
      oldDf.select(expr(s"`$valueCol` div $width").as("bucket")),
      newDf.select(expr(s"`$valueCol` div $width").as("bucket")),
      "bucket")
    // buckets are ORDINAL (categories are not), so the histogram report
    // also carries CUMULATIVE permille shares and their gap — max
    // cum_shift_pm over the report is the integer two-sample
    // Kolmogorov–Smirnov distance in permille, the standard
    // distribution-shift test, thresholdable without any float. The
    // last bucket's cum shares are both exactly 1000 (cum == total), so
    // its gap is always 0 — the sanity invariant. Windows run over the
    // OUTPUT-sized bucket rows, like the totals.
    val wc = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn("__co", sum(col("n_old")).over(wc))
      .withColumn("__cn", sum(col("n_new")).over(wc))
      .withColumn("__to", sum(col("n_old")).over(wt))
      .withColumn("__tn", sum(col("n_new")).over(wt))
      .withColumn("cum_shift_pm",
        abs(when(col("__tn") > 0L, expr("(__cn * 1000) div __tn")).otherwise(0L)
          - when(col("__to") > 0L, expr("(__co * 1000) div __to")).otherwise(0L))
          .cast(LongType))
      .drop("__co", "__cn", "__to", "__tn")
  }

  /** Per-category drift over a discrete column: the same report keyed by
    * the value itself (source names, languages, event types, status
    * codes). NULL is a category of its own (the null-safe join below) —
    * a drift in the NULL RATE is exactly the kind of upstream change
    * this exists to catch. */
  def categoryDrift(oldDf: DataFrame, newDf: DataFrame,
                    keyCol: String): DataFrame =
    drift(oldDf.select(col(keyCol).as("category")),
      newDf.select(col(keyCol).as("category")), "category")

  /** The report from PRE-AGGREGATED (key, n) count tables — the serving
    * shape for a continuously-maintained count state
    * (IncrementalStream.driftMonitor): at 100 TB you do not retain raw
    * arrivals to measure drift, you maintain #categories-sized counts
    * and derive the report from them. Row-identical to [[categoryDrift]]
    * over the corpora the counts summarize (graded, q197 against q196's
    * oracle). Each side is one (key, n) frame; key column name must be
    * `keyCol` and counts must be >= 0. */
  def categoryDriftFromCounts(oldCounts: DataFrame, newCounts: DataFrame,
                              keyCol: String): DataFrame =
    driftFromCounts(
      oldCounts.select(col(keyCol).as("category"), col("n").cast(LongType).as("n_old")),
      newCounts.select(col(keyCol).as("category"), col("n").cast(LongType).as("n_new")),
      "category")

  private def drift(oldKeys: DataFrame, newKeys: DataFrame,
                    keyName: String): DataFrame =
    driftFromCounts(
      oldKeys.groupBy(col(keyName)).agg(count(lit(1)).cast(LongType).as("n_old")),
      newKeys.groupBy(col(keyName)).agg(count(lit(1)).cast(LongType).as("n_new")),
      keyName)

  private def driftFromCounts(oc: DataFrame, nc: DataFrame,
                              keyName: String): DataFrame = {
    // null-safe key equality: a NULL category must line up across the
    // two snapshots, not produce one orphan row per side
    val joined = oc.join(nc, oc(keyName) <=> nc(keyName), "full_outer")
      .select(coalesce(oc(keyName), nc(keyName)).as(keyName),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    // totals over the bounded count rows (output-sized, documented).
    // shares via INTEGER `div`, never double-divide-then-floor (a
    // correctly-rounded double quotient can round UP across an integer
    // and floor wrong — the StrictMath-class cross-engine pitfall)
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    joined
      .withColumn("__to", sum(col("n_old")).over(w))
      .withColumn("__tn", sum(col("n_new")).over(w))
      .select(col(keyName), col("n_old"), col("n_new"),
        when(col("__to") > 0L, expr("(n_old * 1000) div __to"))
          .otherwise(0L).cast(LongType).as("share_old_pm"),
        when(col("__tn") > 0L, expr("(n_new * 1000) div __tn"))
          .otherwise(0L).cast(LongType).as("share_new_pm"))
      .withColumn("shift_pm", abs(col("share_new_pm") - col("share_old_pm")))
  }
}
