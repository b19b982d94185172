package graft.files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Multi-dimensional clustered layout (Z-order) for parquet tables.
  *
  * Parquet scans prune row groups with min/max statistics; a table sorted
  * on one column prunes filters on THAT column and nothing else. Morton
  * (Z-order) interleaving sorts on a space-filling curve instead, so every
  * written file covers a compact hyper-rectangle of ALL clustering
  * dimensions — a filter on any single dimension skips most files. The
  * classic lakehouse `OPTIMIZE ... ZORDER BY` maintenance operation,
  * expressed as plain Catalyst arithmetic.
  *
  * Scale shape: one aggregate for the per-column min/max (broadcast back,
  * no driver round-trip in the plan), one narrow pass computing the z
  * value (pure codegen'd bit arithmetic), one range-partitioned shuffle +
  * per-partition sort — the same cost as any clustered write. Nothing is
  * collected; the only driver-sized object is the range-partitioner's
  * sample. Skew in a clustered column degrades grid occupancy, not
  * correctness: equal-ROW file splits come from the range partitioner,
  * while sparse regions simply yield files with wider bounding boxes
  * (quantile bucketing would tighten them at the price of an
  * approx_percentile pass per column).
  */
object Layout {

  /** Morton value: round-robin bit-interleave of the low `bits` bits of
    * each column (col j's bit i lands at position i*d + j). Inputs must
    * already be bucketized to [0, 2^bits). Static expression tree —
    * whole-stage-codegen'd, no UDF. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 1, "zValue needs at least one column")
    require(bits * d <= 62, s"$bits bits x $d cols overflows a signed long")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Min-max bucketization of a numeric column into [0, 2^bits): the
    * one-pass normalizer (two scalars per column). `lo`/`hi` are the
    * global bounds (columns, so they can come from a broadcast aggregate
    * row rather than a driver collect). A constant column maps to 0. */
  def minMaxBucket(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val n = (1L << bits) - 1
    // the isNull wrap is load-bearing: greatest/least SKIP nulls, so the
    // null arithmetic below would otherwise collapse to bucket 0 and a
    // NULL dim would scatter rows by their other dims instead of
    // grouping at z-range start (the contract both bucketizers share)
    when(c.isNull, lit(null).cast(LongType)).otherwise(
      least(lit(n), greatest(lit(0L), floor(
        (c.cast(DoubleType) - lo) / greatest(hi - lo, lit(Double.MinPositiveValue))
          * (n + 1)).cast(LongType))))
  }

  /** Quantile (equi-depth) bucketization: bucket = how many of the 2^bits-1
    * approx-quantile boundaries the value has passed. The upgrade path for
    * SKEWED columns — min-max bucketing concentrates a skewed column's mass
    * in a few grid cells, so files covering the sparse tail get wide
    * bounding boxes; rank-space bucketing makes occupancy uniform by
    * construction. Cost: one approx_percentile pass per column at write
    * time; the boundary array (2^bits doubles) rides the expression as a
    * literal. The per-row bucket scan is O(2^bits) comparisons — keep
    * `bits` <= 8 on this path. */
  def quantileBucket(c: Column, boundaries: Array[Double]): Column =
    // NULL stays a null bucket (and so a null z) — matching the min-max
    // path's NULL-sorts-first behavior; the otherwise(0) fold would
    // silently place NULLs in bucket 0 and scatter them by the other dims
    when(c.isNull, lit(null).cast(LongType)).otherwise(
      least(lit(boundaries.length.toLong), greatest(lit(0L),
        aggregate(typedLit(boundaries.toSeq), lit(0L),
          (acc, b) => acc + when(c.cast(DoubleType) >= b, 1L).otherwise(0L)))))

  /** Write `df` as parquet clustered on `cols` via Z-order: `numFiles`
    * range-partitioned, z-sorted files. Column order in `cols` is
    * interleave order (all dims get equal bit weight — unlike a
    * lexicographic sort there is no "leading" column). `quantile = true`
    * switches from min-max to equi-depth bucketization (see
    * [[quantileBucket]]) — worth it when a clustering column is heavily
    * skewed; identical output semantics either way (same rows, different
    * file assignment). */
  def clusteredWrite(df: DataFrame, path: String, cols: Seq[String],
                     numFiles: Int, bits: Int = 8, quantile: Boolean = false): Unit = {
    require(cols.nonEmpty, "clusteredWrite needs at least one cluster column")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    // an empty input writes numFiles empty partitions (a valid empty
    // table); NULL cluster values sort together at z-range start (null
    // arithmetic yields a null z, ordered first by rangepartitioning)
    val clustered =
      if (quantile) {
        require(bits <= 12,
          s"quantile path is O(2^bits) comparisons per row — bits=$bits too large")
        val nb = (1 << bits) - 1
        val fracs = (1 to nb).map(_.toDouble / (nb + 1))
        val aggs = cols.map(c => expr(
          s"approx_percentile(cast(`$c` as double), array(${fracs.mkString(",")}), 10000)")
          .as(s"__q_$c"))
        val row = df.agg(aggs.head, aggs.tail: _*).head
        val buckets = cols.zipWithIndex.map { case (c, i) =>
          val bs = Option(row.getSeq[Double](i)).getOrElse(Seq.empty).toArray
          if (bs.isEmpty) lit(0L) else quantileBucket(col(c), bs)
        }
        df.withColumn("__z", zValue(buckets, bits))
      } else {
        val aggs = cols.flatMap(c => Seq(
          min(col(c)).cast(DoubleType).as(s"__lo_$c"),
          max(col(c)).cast(DoubleType).as(s"__hi_$c")))
        val stats = df.agg(aggs.head, aggs.tail: _*)
        val z = zValue(
          cols.map(c => minMaxBucket(col(c), col(s"__lo_$c"), col(s"__hi_$c"), bits)),
          bits)
        df.crossJoin(broadcast(stats)).withColumn("__z", z)
      }
    clustered
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(df.columns.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** File-level min/max statistics index — the manifest every lakehouse
    * table format keeps: one row per data file with each indexed column's
    * bounds. Built with one distributed scan (grouped on
    * input_file_name); at 100 TB the index is itself a small table
    * (#files rows) that should be persisted next to the data and
    * incrementally maintained on write. */
  def statsIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                 cols: Seq[String]): DataFrame =
    spark.read.parquet(path).withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))).head,
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))).tail: _*)

  /** Range-predicate read through the stats index: keep only files whose
    * [min, max] interval overlaps [lo, hi], then re-apply the exact filter
    * (file pruning is a superset guarantee, not a membership one). The
    * driver holds the matched FILE LIST — metadata bounded by #files, the
    * same object every manifest-based planner materializes, never data
    * rows. Returns the filtered frame plus how many files the scan
    * touches: on a [[clusteredWrite]] layout a narrow band touches a small
    * fraction of files on ANY clustered dimension; on a one-column sort
    * only that column prunes. */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
                 idx: DataFrame, valueCol: String, lo: Long, hi: Long): (DataFrame, Long) = {
    val files = idx
      .filter(col(s"min_$valueCol") <= hi && col(s"max_$valueCol") >= lo)
      .select("__file").collect().map(_.getString(0))
    val base =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
    (base.filter(col(valueCol).between(lo, hi)), files.length.toLong)
  }

  /** Layout quality: per-file bounding-box extent of each cluster column,
    * as a fraction of the global extent, averaged over files. A perfect
    * 2-D z-layout of f files approaches sqrt(1/f) per dimension; a
    * single-column sort scores ~1.0 on every OTHER dimension. One scan of
    * the written table (input_file_name grouping), one broadcast of the
    * global extents. Output: one row, `n_files` + `frac_<col>` per column. */
  def bboxFractions(df: DataFrame, cols: Seq[String]): DataFrame = {
    val perFile = df.withColumn("__f", input_file_name())
      .groupBy("__f")
      .agg(cols.map(c => (max(col(c)) - min(col(c))).cast(DoubleType).as(s"__r_$c")).head,
        cols.map(c => (max(col(c)) - min(col(c))).cast(DoubleType).as(s"__r_$c")).tail: _*)
    val totals = df.agg(
      cols.map(c => (max(col(c)) - min(col(c))).cast(DoubleType).as(s"__t_$c")).head,
      cols.map(c => (max(col(c)) - min(col(c))).cast(DoubleType).as(s"__t_$c")).tail: _*)
    perFile.crossJoin(broadcast(totals))
      .agg(count(lit(1)).as("n_files"),
        cols.map(c => avg(col(s"__r_$c") / col(s"__t_$c")).as(s"frac_$c")): _*)
  }
}
