package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("globalRunningSum equals the single-partition window, skewed buckets") {
    val rnd = new scala.util.Random(7)
    // skew: ~half the rows land in bucket 0; several empty-feeling tails
    val rows = (0L until 500L).map { i =>
      val t = if (rnd.nextBoolean()) rnd.nextInt(10).toLong
              else 10L + rnd.nextInt(990)
      (i, t, rnd.nextInt(1000).toLong - 200L) // negatives allowed: sums, not budgets
    }
    val df = rows.toDF("id", "t", "v")
    val got = PrefixSum.globalRunningSum(df, "v", col("t") / lit(100),
        Seq(col("t"), col("id")))
      .select($"id", $"running_v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("running_v",
        sum($"v").over(Window.orderBy($"t", $"id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"running_v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.size === rows.size)
  }

  test("globalRunningSum: one bucket degenerates to the plain window") {
    val df = Seq((1L, 5L), (2L, 7L), (3L, -2L)).toDF("id", "v")
    val got = PrefixSum.globalRunningSum(df, "v", lit(0), Seq(col("id")))
      .select($"id", $"running_v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 5L, 2L -> 12L, 3L -> 10L))
  }

  test("globalRunningSum refuses inputs whose columns collide with scratch names") {
    // __run is every guardedAppend log's lineage column — a silent
    // clobber-then-drop would strip it from the output
    val df = Seq((1L, 10L, "r0")).toDF("id", "v", "__run")
    intercept[IllegalArgumentException] {
      PrefixSum.globalRunningSum(df, "v", col("id"), Seq(col("id")))
    }
  }

  test("globalRunningSum preserves input columns and row count") {
    val df = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "v", "tag")
    val out = PrefixSum.globalRunningSum(df, "v", col("id"), Seq(col("id")))
    assert(out.columns.toSet === Set("id", "v", "tag", "running_v"))
    assert(out.count() === 2)
  }

  test("keyedRunningSum equals the per-key window, skewed buckets and keys") {
    val rnd = new scala.util.Random(11)
    // 3 keys with very different sizes; bucket = t div 100 is
    // order-consistent with (t, id) within every key
    val rows = (0L until 600L).map { i =>
      val k = if (rnd.nextInt(10) < 7) "big" else if (rnd.nextBoolean()) "mid" else "sml"
      val t = rnd.nextInt(1000).toLong
      (i, k, t, rnd.nextInt(100).toLong - 20L)
    }
    val df = rows.toDF("id", "k", "t", "v")
    val got = PrefixSum.keyedRunningSum(df, "v", Seq("k"),
        expr("t div 100"), Seq(col("t"), col("id")))
      .select($"id", $"running_v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("running_v",
        sum($"v").over(Window.partitionBy($"k").orderBy($"t", $"id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"running_v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.size === rows.size)
  }

  test("keyedRunningSum with empty keys IS globalRunningSum") {
    val df = Seq((1L, 5L), (2L, 7L), (3L, -2L)).toDF("id", "v")
    val got = PrefixSum.keyedRunningSum(df, "v", Seq.empty,
        expr("id div 2"), Seq(col("id")))
      .select($"id", $"running_v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 5L, 2L -> 12L, 3L -> 10L))
  }
}
