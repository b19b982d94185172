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

  test("cubeCounts emits cells, both marginals, and the grand total with gid") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 1L)).toDF("k", "v")
    val out = Stats.cubeCounts(df, Seq(col("k"), col("v")))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.get(1)), r.getLong(2),
        r.getAs[Number](3).longValue)).toSet
    assert(out === Set(
      (Some("a"), Some(1L), 2L, 0L), (Some("a"), Some(2L), 1L, 0L), (Some("b"), Some(1L), 1L, 0L),
      (Some("a"), None, 3L, 1L), (Some("b"), None, 1L, 1L),          // v rolled up
      (None, Some(1L), 3L, 2L), (None, Some(2L), 1L, 2L),            // k rolled up
      (None, None, 4L, 3L)))                                         // grand total
  }

  test("percentileDisc picks the value at rank ceil(p*n), integer-exact") {
    // n=4: median rank ceil(2)=2 -> 20; p90 rank ceil(3.6)=4 -> 40
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L),
      ("b", 5L)).toDF("k", "v")
    val out = Stats.percentileDisc(df, Seq("k"), "v",
      Seq(("med", 1, 2), ("p90", 9, 10)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map("a" -> ((20L, 40L)), "b" -> ((5L, 5L))))
  }

  test("percentileDisc n=10 p90 is rank 9, where float 0.9*10 could round to 10") {
    val df = (1L to 10L).map(v => ("k", v)).toDF("k", "v")
    val r = Stats.percentileDisc(df, Seq("k"), "v", Seq(("p90", 9, 10))).head
    assert(r.getLong(1) === 9L)
  }

  test("percentileDisc is invariant under tie order") {
    val df = Seq(("k", 7L), ("k", 7L), ("k", 7L), ("k", 9L)).toDF("k", "v")
    val r = Stats.percentileDisc(df, Seq("k"), "v", Seq(("med", 1, 2))).head
    assert(r.getLong(1) === 7L)
  }

  test("property: percentileDisc equals sorted(values)(ceil(p*n) - 1)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L)),
      Gen.choose(1, 10)) // p = num/10
    val prop = Prop.forAll(gen) { case (vs, num) =>
      val df = vs.map(("k", _)).toDF("k", "v")
      val got = Stats.percentileDisc(df, Seq("k"), "v", Seq(("p", num, 10)))
        .head.getLong(1)
      val n = vs.length
      val rank = (n.toLong * num + 9) / 10 // ceil(p*n), integer-exact
      got == vs.sorted.apply(rank.toInt - 1)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("cubeCounts gid disambiguates a rolled-up dim from a genuine NULL value") {
    val df = Seq((Some("a"), 1L), (None, 1L)).toDF("k", "v")
    val rows = Stats.cubeCounts(df, Seq(col("k"), col("v")))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.get(1)), r.getLong(2),
        r.getAs[Number](3).longValue))
    // k=NULL cell (gid bit clear) vs k rolled up (gid bit set) both exist, distinct
    assert(rows.count { case (None, Some(1L), 1L, 0L) => true; case _ => false } === 1)
    assert(rows.count { case (None, Some(1L), 2L, 2L) => true; case _ => false } === 1)
  }

  test("mergeStats(base, delta) == direct stats; associative across epoch folds") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowGen = Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(-50L, 50L)))
    val prop = Prop.forAll(rowGen, Gen.choose(0, 100)) { (rows, splitPct) =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v")
        val cut = rows.size * splitPct / 100
        val (r1, r2) = rows.splitAt(cut)
        def stats(d: org.apache.spark.sql.DataFrame) =
          Stats.mergeableStats(d, Seq("k"), "v")
        def toMap(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        val direct = toMap(stats(df))
        val merged =
          if (r1.isEmpty) toMap(stats(r2.toDF("k", "v")))
          else if (r2.isEmpty) toMap(stats(r1.toDF("k", "v")))
          else toMap(Stats.mergeStats(
            stats(r1.toDF("k", "v")), stats(r2.toDF("k", "v")), Seq("k")))
        merged == direct
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
    // three-epoch fold in a different order: ((e3 + e1) + e2) == direct
    val e1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val e2 = Seq(("a", 5L)).toDF("k", "v")
    val e3 = Seq(("c", -7L), ("a", 0L)).toDF("k", "v")
    def st(d: org.apache.spark.sql.DataFrame) = Stats.mergeableStats(d, Seq("k"), "v")
    val folded = Stats.mergeStats(Stats.mergeStats(st(e3), st(e1), Seq("k")), st(e2), Seq("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(folded === Map("a" -> (3L, 6L), "b" -> (1L, 2L), "c" -> (1L, -7L)))
  }

  test("topKFromCounts ranks state rows per group with a deterministic tiebreak") {
    val counts = Seq(
      ("s1", "the", 5L), ("s1", "a", 5L), ("s1", "z", 4L), ("s1", "q", 1L),
      ("s2", "x", 2L)).toDF("source", "token", "n")
    val got = Stats.topKFromCounts(counts, Seq("source"), Seq("token"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // ties (n=5) break token-ascending: "a" before "the"
    assert(got === Set(("s1", "a", 5L, 1L), ("s1", "the", 5L, 2L), ("s2", "x", 2L, 1L)))
    intercept[IllegalArgumentException] {
      Stats.topKFromCounts(counts, Seq("source"), Seq("token"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Stats.topKFromCounts(counts, Seq("source"), Seq.empty, k = 2)
    }
  }
}
