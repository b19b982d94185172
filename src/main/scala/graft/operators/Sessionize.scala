package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-analytics operator: a new
  * session starts when the gap to the previous event of the same key exceeds
  * `gap` (units = the ts column's own units).
  *
  * Batch form: two window passes over one shuffle on the key — lag to mark
  * session breaks, running sum of breaks to number sessions. No state, no
  * driver involvement; at 100 TB this is one keyed shuffle like any
  * aggregation. The streaming form (bounded state per live session) is
  * `streaming.IncrementalStream.sessionizeStream` — NOTE its documented
  * bounded-state divergence: an event arriving more than a gap BEFORE the
  * open session closes immediately as a singleton, so two such stragglers
  * within a gap of each other become two sessions where this batch operator
  * would merge them into one (exact whenever late events arrive
  * gap-isolated; see the scaladoc there for the full argument).
  */
object Sessionize {

  /** Adds `session_idx` (0-based per key) to each event row. */
  def withSessionIndex(events: DataFrame, keyCol: String, tsCol: String,
                       gap: Column, tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val break = when(prev.isNull || col(tsCol) - prev <= gap, lit(0)).otherwise(lit(1))
    events.withColumn("session_idx",
      sum(break).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
  }

  /** Per-key session statistics: event count and session count. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   gap: Column, tieBreak: Seq[String] = Seq.empty): DataFrame =
    withSessionIndex(events, keyCol, tsCol, gap, tieBreak)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        (max(col("session_idx")) + 1).cast("long").as("n_sessions"))

  /** Same statistics through Spark's NATIVE session_window aggregate (one
    * hash-agg pass with in-aggregate session merging — no window-function
    * sort, and the identical groupBy works unchanged on a stream).
    *
    * Boundary semantics: session merging is INCLUSIVE — an event starting
    * exactly at the current session's end (last + gap) merges into it —
    * which is precisely the lag form's `ts - prev <= gap` keep-condition,
    * so the two forms agree on every input including exact-boundary gaps
    * (pinned by SessionizeSpec with gaps of exactly `gap` and
    * `gap + 1us`). */
  def sessionStatsNative(events: DataFrame, keyCol: String, tsCol: String,
                         gapDuration: String): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gapDuration))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).cast("long").as("n_events"),
        count(lit(1)).cast("long").as("n_sessions"))
}
