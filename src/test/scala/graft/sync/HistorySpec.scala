package graft.sync

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("id", "name", "cents")

  private def rowsOf(h: DataFrame): Set[(Long, String, Long, Long, Option[Long])] =
    h.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet

  private val pks = Seq("id")
  private val cmp = Seq("name", "cents")

  test("init opens every row at the seed version") {
    val h = History.scd2Init(snap((1L, "a", 10L), (2L, "b", 20L)), 1L)
    assert(rowsOf(h) === Set((1L, "a", 10L, 1L, None), (2L, "b", 20L, 1L, None)))
  }

  test("apply closes changed/removed rows and opens changed/added rows") {
    val h1 = History.scd2Init(snap((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)), 1L)
    // v2: id 1 unchanged, id 2 changed, id 3 removed, id 4 added
    val h2 = History.scd2Apply(h1, snap((1L, "a", 10L), (2L, "b", 25L), (4L, "d", 40L)),
      pks, cmp, 2L)
    assert(rowsOf(h2) === Set(
      (1L, "a", 10L, 1L, None),      // unchanged: interval untouched
      (2L, "b", 20L, 1L, Some(2L)),  // changed: closed at 2
      (2L, "b", 25L, 2L, None),      //          and reopened at 2
      (3L, "c", 30L, 1L, Some(2L)),  // removed: closed, no replacement
      (4L, "d", 40L, 2L, None)))     // added: opened at 2
  }

  test("a reapplied identical snapshot is a no-op") {
    val s = snap((1L, "a", 10L), (2L, "b", 20L))
    val h1 = History.scd2Init(s, 1L)
    val h2 = History.scd2Apply(h1, s, pks, cmp, 2L)
    assert(rowsOf(h2) === rowsOf(h1))
  }

  test("a removed key that reappears opens a fresh interval with a visible gap") {
    val h1 = History.scd2Init(snap((1L, "a", 10L)), 1L)
    val h2 = History.scd2Apply(h1, snap(), pks, cmp, 2L)
    val h3 = History.scd2Apply(h2, snap((1L, "a", 99L)), pks, cmp, 3L)
    assert(rowsOf(h3) === Set((1L, "a", 10L, 1L, Some(2L)), (1L, "a", 99L, 3L, None)))
    // inside the gap the key does not exist
    assert(History.asOf(h3, 2L).count() === 0L)
  }

  test("closed intervals pass through later applies untouched") {
    val h1 = History.scd2Init(snap((1L, "a", 10L)), 1L)
    val h2 = History.scd2Apply(h1, snap((1L, "a", 11L)), pks, cmp, 2L)
    val h3 = History.scd2Apply(h2, snap((1L, "a", 12L)), pks, cmp, 3L)
    assert(rowsOf(h3) === Set(
      (1L, "a", 10L, 1L, Some(2L)),
      (1L, "a", 11L, 2L, Some(3L)),
      (1L, "a", 12L, 3L, None)))
  }

  test("asOf(k) reproduces each applied snapshot exactly") {
    val s1 = snap((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    val s2 = snap((1L, "a", 10L), (2L, "b", 25L), (4L, "d", 40L))
    val s3 = snap((2L, "b", 26L), (4L, "d", 40L), (5L, "e", 50L))
    val h = History.scd2Apply(
      History.scd2Apply(History.scd2Init(s1, 1L), s2, pks, cmp, 2L), s3, pks, cmp, 3L)
    for ((s, v) <- Seq((s1, 1L), (s2, 2L), (s3, 3L))) {
      val got = History.asOf(h, v).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val want = s.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === want, s"asOf($v)")
    }
    // beyond the last version the current rows still apply
    assert(History.asOf(h, 9L).count() === 3L)
    // before the first version nothing exists
    assert(History.asOf(h, 0L).count() === 0L)
  }

  test("NULL compare values are change-detected null-safely") {
    val h1 = History.scd2Init(
      Seq((1L, Option.empty[String], 10L), (2L, Some("b"), 20L)).toDF("id", "name", "cents"), 1L)
    val h2 = History.scd2Apply(h1,
      Seq((1L, Some("x"), 10L), (2L, Option.empty[String], 20L)).toDF("id", "name", "cents"),
      pks, cmp, 2L)
    // NULL -> value and value -> NULL both close + reopen
    assert(h2.filter("valid_to = 2").count() === 2L)
    assert(h2.filter("valid_from = 2 AND valid_to IS NULL").count() === 2L)
  }

  test("scd2ApplyUpserts: absent keys stay open; re-delivered rows are no-ops") {
    val h1 = History.scd2Init(snap((1L, "a", 10L), (2L, "b", 20L)), 1L)
    // delta: id 2 changed, id 3 new; id 1 absent (must stay open)
    val h2 = History.scd2ApplyUpserts(h1, snap((2L, "b", 25L), (3L, "c", 30L)),
      pks, cmp, 2L)
    assert(rowsOf(h2) === Set(
      (1L, "a", 10L, 1L, None),
      (2L, "b", 20L, 1L, Some(2L)), (2L, "b", 25L, 2L, None),
      (3L, "c", 30L, 2L, None)))
    // at-least-once: re-delivering id 2's CURRENT value changes nothing
    val h3 = History.scd2ApplyUpserts(h2, snap((2L, "b", 25L)), pks, cmp, 3L)
    assert(rowsOf(h3) === rowsOf(h2))
  }

  test("scd2Close closes exactly the listed keys' open intervals, idempotently") {
    val h1 = History.scd2Init(snap((1L, "a", 10L), (2L, "b", 20L)), 1L)
    val h2 = History.scd2Close(h1, Seq(Tuple1(2L)).toDF("id"), pks, 2L)
    assert(rowsOf(h2) === Set((1L, "a", 10L, 1L, None), (2L, "b", 20L, 1L, Some(2L))))
    // closing an already-closed or unknown key is a no-op
    val h3 = History.scd2Close(h2, Seq(Tuple1(2L), Tuple1(9L)).toDF("id"), pks, 3L)
    assert(rowsOf(h3) === rowsOf(h2))
    // and the upsert+close pair equals the full-snapshot apply
    val viaSnapshot = History.scd2Apply(h1, snap((1L, "a", 10L)), pks, cmp, 2L)
    assert(rowsOf(h2) === rowsOf(viaSnapshot))
  }

  test("pitJoin picks the interval covering each fact's version; gaps keep NULLs") {
    val s1 = snap((1L, "a", 10L))
    val h = History.scd2Apply(
      History.scd2Apply(History.scd2Init(s1, 1L), snap(), pks, cmp, 2L),
      snap((1L, "a", 99L)), pks, cmp, 3L) // removed at 2, back at 3
    val facts = Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 300L), (7L, 1L, 700L))
      .toDF("id", "ver", "amount")
    val got = History.pitJoin(facts, h, pks, "ver").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(got === Set(
      (1L, 1L, 100L, "a", 10L),   // covered by [1, 2)
      (1L, 2L, 200L, null, -1L),  // the gap: dimension absent at 2
      (1L, 3L, 300L, "a", 99L),   // covered by [3, null)
      (7L, 1L, 700L, null, -1L))) // never-seen key stays, NULL dims
    // fact multiplicity preserved: at most one interval covers a version
    assert(History.pitJoin(facts, h, pks, "ver").count() === facts.count())
  }

  test("pitJoin rejects fact/dimension column collisions") {
    val h = History.scd2Init(snap((1L, "a", 10L)), 1L)
    val facts = Seq((1L, 1L, "x")).toDF("id", "ver", "name") // name collides
    intercept[IllegalArgumentException] {
      History.pitJoin(facts, h, pks, "ver")
    }
    // fact columns named valid_from/valid_to would be swept up by the
    // post-join drop of the history's interval bounds — rejected
    intercept[IllegalArgumentException] {
      History.pitJoin(Seq((1L, 1L)).toDF("id", "valid_from"), h, pks, "valid_from")
    }
  }

  test("property: asOf(k) equals snapshot k for random snapshot sequences; " +
       "upsert applies forward-fill the last delivered value") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // a snapshot is a small id -> cents map; sequences of 2-4 snapshots
    val snapGen = Gen.mapOf(Gen.zip(Gen.choose(1L, 8L), Gen.choose(0L, 3L)))
    val seqGen = Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, snapGen))
    val prop = Prop.forAll(seqGen) { snaps =>
      def df(m: Map[Long, Long]) =
        if (m.isEmpty) Seq.empty[(Long, String, Long)].toDF("id", "name", "cents")
        else m.toSeq.map { case (k, v) => (k, "x", v) }.toDF("id", "name", "cents")
      val full = snaps.zipWithIndex.drop(1).foldLeft(History.scd2Init(df(snaps.head), 1L)) {
        case (h, (s, i)) => History.scd2Apply(h, df(s), pks, cmp, i + 1L)
      }
      // full-snapshot law: time travel reproduces every snapshot exactly
      val snapshotsHold = snaps.zipWithIndex.forall { case (s, i) =>
        History.asOf(full, i + 1L).collect()
          .map(r => r.getLong(0) -> r.getLong(2)).toMap == s
      }
      // upsert law: asOf(k) equals the forward-fill of all deltas <= k
      // (absent keys persist; upsert history never closes on absence)
      val ups = snaps.zipWithIndex.drop(1).foldLeft(History.scd2Init(df(snaps.head), 1L)) {
        case (h, (s, i)) =>
          val prev = snaps(i - 1)
          val delta = s.filter { case (k, v) => !prev.get(k).contains(v) }
          History.scd2ApplyUpserts(h, df(delta), pks, cmp, i + 1L)
      }
      val upsertsHold = snaps.indices.forall { i =>
        val want = snaps.take(i + 1).foldLeft(Map.empty[Long, Long])(_ ++ _)
        History.asOf(ups, i + 1L).collect()
          .map(r => r.getLong(0) -> r.getLong(2)).toMap == want
      }
      snapshotsHold && upsertsHold
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("retainSince drops only intervals ended at/before the horizon; later reads unchanged") {
    // k1: [1,2) closed + [2,-) open; k2: [1,3) closed; k3: [3,-) open
    val h = History.scd2Apply(
      History.scd2Apply(History.scd2Init(snap((1L, "a", 10L), (2L, "b", 20L)), 1L),
        snap((1L, "a", 11L), (2L, "b", 20L)), pks, cmp, 2L),
      snap((1L, "a", 11L), (3L, "c", 30L)), pks, cmp, 3L)
    val pruned = History.retainSince(h, 2L)
    assert(rowsOf(pruned) === Set(
      (1L, "a", 11L, 2L, None),        // open: kept
      (2L, "b", 20L, 1L, Some(3L)),    // ends past the horizon: kept
      (3L, "c", 30L, 3L, None)))       // k1's [1,2) ended AT the horizon: dropped
    // the retention contract: asOf at/after the horizon is identical
    for (v <- Seq(2L, 3L))
      assert(History.asOf(pruned, v).collect().toSet ===
        History.asOf(h, v).collect().toSet, s"asOf($v) drifted")
  }

  test("non-monotonic version fails loudly instead of inverting intervals") {
    def rootMessages(e: Throwable): String = {
      val sb = new StringBuilder
      var cur: Throwable = e
      while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
      sb.toString
    }
    val h = History.scd2Init(snap((1L, "a", 10L)), 5L)
    // a CHANGED value at a version <= the open row's valid_from would
    // emit valid_to <= valid_from — the guard must fire on the close
    for (bad <- Seq(5L, 3L)) {
      val e = intercept[Exception] {
        History.scd2Apply(h, snap((1L, "a", 99L)), pks, cmp, bad).collect()
      }
      assert(rootMessages(e).contains("strictly increasing"), rootMessages(e))
      val e2 = intercept[Exception] {
        History.scd2Close(h, Seq(1L).toDF("id"), pks, bad).collect()
      }
      assert(rootMessages(e2).contains("strictly increasing"), rootMessages(e2))
    }
    // but a NO-OP redelivery at the same version stays legal: the
    // unchanged arm never closes, so at-least-once upsert replays keep
    // their idempotence guarantee
    val replay = History.scd2ApplyUpserts(h, snap((1L, "a", 10L)), pks, cmp, 5L)
    assert(rowsOf(replay) === Set((1L, "a", 10L, 5L, None)))
  }

  test("contract violations throw") {
    val h = History.scd2Init(snap((1L, "a", 10L)), 1L)
    intercept[IllegalArgumentException] {
      History.scd2Apply(h, snap(), Seq.empty, cmp, 2L)
    }
    intercept[IllegalArgumentException] {
      History.scd2Apply(h.select("id", "name", "cents", "valid_to", "valid_from"),
        snap(), pks, cmp, 2L)
    }
    intercept[IllegalArgumentException] {
      History.scd2Init(h, 2L) // already a history
    }
  }
}
