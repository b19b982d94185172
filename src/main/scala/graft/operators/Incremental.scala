package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O7 — incremental filter scan (reference: db-sync-local/sync_utils.py:57-77).
  *
  * The reference emits `WHERE check_column {op} value` with a strict `>` for
  * both `id` and `timestamp` check types (sync_utils.py:63); the `>=` branch is
  * unreachable in shipped configs (SURVEY §2.4-4) but kept for parity.
  *
  * Scale: expressed as a plain Catalyst predicate so it is pushed into the
  * scan — parquet row-group min/max skipping, or the remote `WHERE` of a JDBC
  * source (`pushDownPredicate` is on by default). At 100 TB this is the
  * difference between reading the delta and reading the world.
  */
object Incremental {

  /** Strict `>` — the operator used for id and timestamp check types. */
  def newerThan(src: DataFrame, checkColumn: String, watermark: Column): DataFrame =
    src.filter(col(checkColumn) > watermark)

  /** `>=` variant (reference's fallback operator for other check types). */
  def atLeast(src: DataFrame, checkColumn: String, watermark: Column): DataFrame =
    src.filter(col(checkColumn) >= watermark)

  /** Full-vs-incremental branch on watermark NULLness — the reference's only
    * "planner" decision (sync_utils.py:259-265). */
  def extract(src: DataFrame, checkColumn: String, watermark: Option[Column]): DataFrame =
    watermark match {
      case Some(w) => newerThan(src, checkColumn, w)
      case None    => src
    }
}
