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

  /** Fixed-width histogram over an INTEGER column (callers integerize
    * floats first — cents via round(x*100) — so bucket edges are exact on
    * every engine): bucket = value div width, one hash-aggregate shuffle
    * with map-side partial counts. The data-profiling pass of a curation
    * pipeline; at 100 TB the output is `range/width` rows regardless of
    * input size. Integer `div` truncates toward zero, so keep values
    * non-negative (or accept the -0-straddling bucket). */
  def histogram(df: DataFrame, valueCol: String, width: Long): DataFrame = {
    require(width > 0, s"histogram width must be positive, got $width")
    df.groupBy(expr(s"$valueCol div $width").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** CUBE counts over the given dimension columns: one row per cell of
    * every 2^d dimension subset (the full OLAP crosstab — per-dim
    * marginals and the grand total fall out of the same pass). Spark plans
    * CUBE as a single Expand + hash aggregate: the input is scanned ONCE
    * and each row fans out to its 2^d grouping-set replicas map-side, so
    * at 100 TB the cost is one shuffle of (2^d × distinct cells) partial
    * aggregates, not 2^d separate scans. `gid` (Spark's grouping_id ==
    * SQL GROUPING_ID: bit i set when dim i is rolled up) disambiguates a
    * rolled-up dimension from a genuine NULL value, so callers need no
    * sentinel values in the dim domain. */
  def cubeCounts(df: DataFrame, dims: Seq[Column]): DataFrame = {
    require(dims.nonEmpty, "cubeCounts needs at least one dimension")
    df.cube(dims: _*)
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
  }
}
