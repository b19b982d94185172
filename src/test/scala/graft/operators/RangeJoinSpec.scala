package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, id, t)
  private val rows = Seq(
    ("u", 1L, 0L), ("u", 2L, 50L), ("u", 3L, 100L), ("u", 4L, 100L),
    ("u", 5L, 260L),             // far from the 0-100 cluster
    ("v", 6L, 55L))              // other key, near u's times but never pairs
    .toDF("k", "id", "t")

  private def pairs(window: Long) =
    RangeJoin.pairsWithin(rows, Seq("k"), "t", "id", window)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet

  test("finds exactly the within-window pairs, exactly once, keys isolated") {
    // window 100 (inclusive): (1,2) 50, (1,3)/(1,4) 100, (2,3)/(2,4) 50,
    // (3,4) tie at t=100 ordered by id; 5 is 160 away from t=100
    assert(pairs(100L) === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("cross-bucket pairs are found (straddling a band boundary)") {
    // window 60: (1,2) diff 50 straddles buckets 0|0; (2,3) diff 50
    // straddles buckets 0|1 — the exploded band catches it
    assert(pairs(60L) === Set((1L, 2L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("agrees with the brute-force inequality join on every window") {
    for (w <- Seq(1L, 49L, 50L, 99L, 160L, 1000L)) {
      val brute = rows.as("a").join(rows.as("b"),
          $"a.k" === $"b.k"
            && ($"a.t" < $"b.t" || ($"a.t" === $"b.t" && $"a.id" < $"b.id"))
            && $"b.t" - $"a.t" <= w)
        .select($"a.id", $"b.id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs(w) === brute, s"window $w")
    }
  }

  test("property: banded pairs == in-memory brute force on random timelines") {
    val rowGen = Gen.listOf(Gen.zip(
      Gen.oneOf("u", "v"), Gen.choose(0L, 300L))).map(_.zipWithIndex
      .map { case ((k, t), i) => (k, i.toLong, t) })
    val winGen = Gen.choose(1L, 150L)
    val prop = Prop.forAll(rowGen, winGen) { (rs, w) =>
      val found =
        if (rs.isEmpty) Set.empty[(Long, Long)]
        else RangeJoin.pairsWithin(rs.toDF("k", "id", "t"), Seq("k"), "t", "id", w)
          .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
      val brute = (for {
        (ka, ia, ta) <- rs; (kb, ib, tb) <- rs
        if ka == kb && (ta < tb || (ta == tb && ia < ib)) && tb - ta <= w
      } yield (ia, ib)).toSet
      found == brute
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("boxPairsWithin: exact-once pairs incl. negative coords and y in both directions") {
    // y goes BOTH ways from a row (unlike the oriented x): (1,2) pairs with
    // y_b < y_a; negatives exercise the trunc-div widened zero bucket
    val pts = Seq((1L, 0L, 5L), (2L, 3L, -4L), (3L, 12L, 5L), (4L, -9L, 0L))
      .toDF("id", "x", "y")
    val got = RangeJoin.boxPairsWithin(pts, Seq.empty, "x", "y", "id", 10L, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    // brute force: (1,2) dx3 dy9; (1,3) dx12 out; (2,3) dx9 dy9;
    // (4,1) dx9 dy5; (4,2) dx12 out; (4,3) dx21 out
    assert(got === Set((1L, 2L), (2L, 3L), (4L, 1L)))
  }

  test("property: box pairs == in-memory brute force on random 2D points") {
    val rowGen = Gen.listOf(Gen.zip(
      Gen.choose(-100L, 100L), Gen.choose(-100L, 100L))).map(_.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) })
    val winGen = Gen.choose(1L, 60L)
    val prop = Prop.forAll(rowGen, winGen, winGen) { (rs, wx, wy) =>
      val found =
        if (rs.isEmpty) Set.empty[(Long, Long)]
        else RangeJoin.boxPairsWithin(rs.toDF("id", "x", "y"), Seq.empty,
          "x", "y", "id", wx, wy)
          .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      val brute = (for {
        (ia, xa, ya) <- rs; (ib, xb, yb) <- rs
        if (xa < xb || (xa == xb && ia < ib)) && xb - xa <= wx
        if math.abs(ya - yb) <= wy
      } yield (ia, ib)).toSet
      found == brute
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
