package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("counts fuses total + conditional counts into one row") {
    val df = Seq(1, 2, 3, 4, 5).toDF("x")
    val r = Stats.counts(df, Seq("even" -> (col("x") % 2 === 0), "big" -> (col("x") > 3))).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((5L, 2L, 2L)))
  }

  test("histogram buckets by integer division and counts per bucket") {
    val df = Seq(0L, 1L, 499L, 500L, 999L, 1000L, 2500L).toDF("c")
    val out = Stats.histogram(df, "c", 500L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 3L, 1L -> 2L, 2L -> 1L, 5L -> 1L))
  }

  test("histogram rejects a non-positive width") {
    val e = intercept[IllegalArgumentException](
      Stats.histogram(Seq(1L).toDF("c"), "c", 0L))
    assert(e.getMessage.contains("width"))
  }
}
