package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("histogramDrift: full-outer bucket union, exact permille floors, cumulative KS gap") {
    // old: 10, 25, 25, 90 -> buckets 1,2,2,9 (width 10); new: 25, 95, 95
    val old = Seq(10L, 25L, 25L, 90L).toDF("v")
    val nw = Seq(25L, 95L, 95L).toDF("v")
    val rows = Drift.histogramDrift(old, nw, "v", 10L).collect()
    val got = rows
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // shares: old total 4, new total 3 — floor(1000*n/total)
    assert(got === Map(
      1L -> ((1L, 0L, 250L, 0L, 250L)),
      2L -> ((2L, 1L, 500L, 333L, 167L)),
      9L -> ((1L, 2L, 250L, 666L, 416L))))
    // cumulative gap: |floor(1000·cum_new/3) − floor(1000·cum_old/4)|
    // bucket 1: |0 − 250| = 250; bucket 2: |333 − 750| = 417; last: 0
    val cum = rows.map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(cum === Map(1L -> 250L, 2L -> 417L, 9L -> 0L))
    // the integer KS distance in permille is the max cumulative gap,
    // and the last bucket's gap is 0 by construction (cum == total)
    assert(cum.values.max === 417L)
  }

  test("categoryDrift: NULL is a category; an empty snapshot reports zero shares") {
    val old = Seq(Some("a"), Some("a"), None).toDF("k")
    val nw = Seq(Some("a"), None, None, Some("b")).toDF("k")
    val got = Drift.categoryDrift(old, nw, "k")
      .collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2),
        r.getLong(5)))).toMap
    assert(got === Map(
      Some("a") -> ((2L, 1L, 416L)),  // 666 -> 250
      None -> ((1L, 2L, 167L)),       // 333 -> 500
      Some("b") -> ((0L, 1L, 250L)))) // 0 -> 250
    // empty old side: shares_old all 0, no division blow-up
    val emptyOld = Drift.categoryDrift(old.filter($"k" === "zzz"), nw, "k")
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(emptyOld.forall(_._1 == 0L) && emptyOld.map(_._2).sum >= 999L - 3L)
  }

  test("degenerate width is rejected") {
    intercept[IllegalArgumentException] {
      Drift.histogramDrift(Seq(1L).toDF("v"), Seq(1L).toDF("v"), "v", 0L)
    }
  }
}
