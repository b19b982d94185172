package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O18 — aggregate statistics (reference: gcs_sync.py:30-47 total/new/existing
  * counts; main.py:10,25-30 success/failure maps).
  *
  * Conditional counts in ONE pass: `count(when(cond, 1))` per condition inside
  * a single `agg` — one scan, partial aggregation map-side, a single final row.
  * The reference runs one COUNT-ish pass per stat; at 100 TB, fusing them
  * matters.
  */
object Stats {

  /** total + one conditional count per named predicate, single scan. */
  def counts(df: DataFrame, conds: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("total") +:
      conds.map { case (name, c) => count(when(c, lit(1))).as(name) }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
