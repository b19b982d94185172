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
                       order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "globalRunningSum: empty order")
    // scratch/output name collisions clobber-then-drop caller columns —
    // in this repo every guardedAppend log carries __run, which a silent
    // collision would strip from the output, losing lineage data
    val reserved = Seq("__b", "__run", "__tot", "__r", "__off", s"running_$valueCol")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"globalRunningSum: input columns ${clash.mkString(", ")} collide with " +
        "internal/output names — rename them first")
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val b = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
        org.apache.spark.sql.GraftColumnBridge.expression(bucket)))
    val keyed = df.withColumn("__b", b).repartition(n, col("__b"))
    val wRun = Window.partitionBy(col("__b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBucket = Window.partitionBy(col("__b"))
    val summed = keyed
      .withColumn("__run", sum(col(valueCol)).over(wRun))
      .withColumn("__tot", sum(col(valueCol)).over(wBucket))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__b")).orderBy(order: _*)))
    // exclusive prefix sum over bucket totals, via each bucket's first-row
    // representative — |buckets| rows through the only global window
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = summed.filter(col("__r") === 1)
      .select(col("__b"),
        coalesce(sum(col("__tot")).over(wOff), lit(0L)).as("__off"))
    summed.join(broadcast(offsets), "__b")
      .withColumn(s"running_$valueCol", col("__off") + col("__run"))
      .drop("__b", "__run", "__tot", "__r", "__off")
  }
}
