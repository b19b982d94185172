package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parallel GLOBAL prefix sum — the running-total-over-a-total-order shape
  * (cumulative revenue over time, cumulative token counts over a corpus
  * order) WITHOUT the single-partition window the naive
  * `sum() OVER (ORDER BY ...)` formulation pays: Spark executes an
  * un-partitioned window by funneling every row through one task, serial
  * at any cluster size. This is the q106 sharded-shuffle decomposition
  * applied to running sums: an order-consistent bucket key splits the
  * global order into parallel per-bucket windows, and an exclusive prefix
  * sum over the per-bucket TOTALS (a bucket-count-sized broadcast, not the
  * data) lifts each bucket's local running sum to the global one.
  */
object PrefixSum {

  /** Global running sum of `valueCol` over the total order `order`:
    * adds `running_<valueCol>` = sum of the value over all rows at-or-
    * before this one in the global order.
    *
    * `bucket` must be ORDER-CONSISTENT with `order`: for rows a, b with
    * bucket(a) < bucket(b), a must precede b in the global order (e.g. a
    * time-derived bucket for a time order — the caller picks granularity
    * to balance bucket count vs skew; a hot bucket serializes only its
    * own rows). Within a bucket the order applies locally, so the
    * decomposition is exact, not approximate.
    *
    * Plan shape (the q106 single-exchange discipline): one hash exchange
    * on the bucket key; per-bucket running sum, per-bucket total, and the
    * bucket's first-row representative all come from windows over that
    * SAME clustering (a separate groupBy branch for totals would get
    * column-pruned into a second exchange subtree that ReuseExchange
    * cannot dedup — observed on q106); the exclusive-prefix offsets
    * window orders only the ~|buckets| representatives and broadcasts
    * back. At 100 TB: one corpus shuffle, one broadcast of |buckets|
    * longs — against the naive plan's one-task sort of everything.
    *
    * PRECONDITIONS: `valueCol` non-null (a NULL would ride through
    * `sum` skipping semantics and desync local vs global offsets — filter
    * or coalesce first); `order` total within a bucket (ties make the
    * running value order-dependent); bucket expression non-null —
    * ENFORCED with an AssertNotNull wrapper, which does double duty: a
    * null bucket fails loudly instead of silently mis-ranking, and the
    * key column planning as non-nullable is what lets ReuseExchange
    * dedup the offsets branch onto the data branch's shuffle (a nullable
    * key gets the inner join's IsNotNull pushed into only ONE subtree,
    * observed to break reuse and scan the corpus twice). Use integer
    * values (cents, token counts) for cross-engine exactness — float
    * prefix sums are association-order-dependent by nature. */
  def globalRunningSum(df: DataFrame, valueCol: String, bucket: Column,
                       order: Seq[Column]): DataFrame =
    keyedRunningSum(df, valueCol, Seq.empty, bucket, order)

  /** PER-KEY running sum with the same bucket decomposition: within each
    * `keys` group, `running_<valueCol>` is the inclusive prefix sum over
    * `order`. The shape the per-source token-budget / mixture-selection /
    * window-packing operators need at 100 TB: sources are LOW-cardinality
    * (~10), so `Window.partitionBy(source)` funnels each source's entire
    * stream through ONE task — a 10 TB single-task sort on a big source.
    * Here the exchange key is (keys, bucket): a source's stream splits
    * across its buckets in parallel, and the offsets join (one row per
    * (key, bucket) — broadcast-sized for any dashboard-sized key count ×
    * caller-chosen bucket granularity) lifts local sums to per-key global
    * ones. `bucket` must be order-consistent with `order` WITHIN each key
    * (the global contract, applied per key); all other preconditions
    * (non-null value, total order, non-null bucket — AssertNotNull
    * enforced) carry over verbatim, and KEYS must be non-null too
    * (AssertNotNull-wrapped like the bucket, for the same two reasons:
    * fail loudly instead of silently grouping NULLs, and a nullable join
    * key gets the offsets join's IsNotNull pushed into only one subtree,
    * breaking ReuseExchange and scanning the corpus twice — the pinned
    * q153 discipline). `keys = Seq.empty` IS [[globalRunningSum]].
    *
    * `aggOffsets` picks how the per-bucket offsets are produced:
    *  - false (default): from the data branch's own windows, deduped by
    *    ReuseExchange — ONE corpus scan and shuffle. This REQUIRES a
    *    narrow input (every column participates in keys/order/value):
    *    an extra payload column gets pruned out of the offsets subtree
    *    only, the exchange subtrees stop being identical, reuse silently
    *    breaks, and the corpus exchanges TWICE (observed on
    *    packedWindows' token arrays).
    *  - true: from an independent second scan that partial-aggregates
    *    per-(key, bucket) totals map-side — the shuffle is
    *    representatives-sized, not corpus-sized, and there is no
    *    corpus-wide sort in the offsets branch at all. Two scans, but
    *    the right trade when the data branch carries heavy payload
    *    columns: the payload moves through ONE exchange and the second
    *    scan re-reads only the value's source columns. */
  def keyedRunningSum(df: DataFrame, valueCol: String, keys: Seq[String],
                      bucket: Column, order: Seq[Column],
                      aggOffsets: Boolean = false): DataFrame = {
    require(order.nonEmpty, "keyedRunningSum: empty order")
    // scratch/output name collisions clobber-then-drop caller columns —
    // in this repo every guardedAppend log carries __run, which a silent
    // collision would strip from the output, losing lineage data
    val reserved = Seq("__b", "__run", "__tot", "__r", "__off", s"running_$valueCol")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"keyedRunningSum: input columns ${clash.mkString(", ")} collide with " +
        "internal/output names — rename them first")
    require(keys.toSet.intersect(reserved.toSet).isEmpty,
      s"keyedRunningSum: keys ${keys.mkString(", ")} collide with internal names")
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    def notNull(c: Column): Column = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))
    val kc = keys.map(col)
    val pb = kc :+ col("__b")
    // keys re-projected through AssertNotNull (values identical for valid
    // data): the join key planning as non-nullable is what lets the
    // offsets branch reuse the data branch's exchange
    val asserted = keys.foldLeft(df)((d, k) => d.withColumn(k, notNull(col(k))))
    val keyed = asserted.withColumn("__b", notNull(bucket)).repartition(n, pb: _*)
    val wRun = Window.partitionBy(pb: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = keyed.withColumn("__run", sum(col(valueCol)).over(wRun))
    // exclusive prefix sum over bucket totals — |keys × buckets| rows
    // through the only per-key (or, with no keys, global) window
    val wOff = Window.partitionBy(kc: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val (summed, offsets) =
      if (aggOffsets) {
        // independent narrow branch: map-side partial sums collapse each
        // (key, bucket) before the shuffle — nothing corpus-sized moves
        val totals = asserted.withColumn("__b", notNull(bucket))
          .groupBy(pb: _*).agg(sum(col(valueCol)).as("__tot"))
        (run, totals.select(pb :+
          coalesce(sum(col("__tot")).over(wOff), lit(0L)).as("__off"): _*))
      } else {
        // bucket totals and first-row representatives from windows over
        // the SAME clustering as the running sum, so the offsets branch
        // reuses the data branch's exchange (narrow inputs only — see
        // the aggOffsets contract)
        val wBucket = Window.partitionBy(pb: _*)
        val s = run
          .withColumn("__tot", sum(col(valueCol)).over(wBucket))
          .withColumn("__r", row_number().over(
            Window.partitionBy(pb: _*).orderBy(order: _*)))
        (s, s.filter(col("__r") === 1).select(pb :+
          coalesce(sum(col("__tot")).over(wOff), lit(0L)).as("__off"): _*))
      }
    summed.join(broadcast(offsets), keys :+ "__b")
      .withColumn(s"running_$valueCol", col("__off") + col("__run"))
      // a using-columns join moves the key columns to the front — pin the
      // caller's column order (callers select positionally after drops)
      .select(df.columns.map(col) :+ col(s"running_$valueCol"): _*)
  }
}
