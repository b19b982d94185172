package graft

import org.apache.spark.sql.DataFrame

/** Eager block release for SUPERSEDED local checkpoints — shared by every
  * driver-side iteration that checkpoints per round (the CC loops in
  * `dedup.Dedup`, the BPE merge loop in `text.TextAnalysis`).
  *
  * `Dataset.unpersist` goes through the cache manager, which has NO entry
  * for a localCheckpoint-backed Dataset — the internal RDD stays pinned in
  * executor block memory until the driver happens to GC the superseded
  * Dataset and ContextCleaner runs (measured as 1.6 s-vs-4 s bench
  * bimodality on an identical CC plan; at 100 TB these blocks sit in
  * executor memory, so eager release is the scale story, not a bench
  * nicety). The fix is to unpersist the RDD behind the checkpoint's
  * LogicalRDD directly.
  *
  * Only call on checkpoints whose SUCCESSOR is already materialized
  * (localCheckpoint is eager): a released local checkpoint cannot be
  * recomputed — lineage is truncated by design — so release means "no
  * live plan references this". */
object Checkpoints {
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      l.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
