package graft.sync

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def store() = new ParquetStore(spark,
    java.nio.file.Files.createTempDirectory("graft_takedown").toString)

  test("purge removes exactly the listed ids, atomically, and reports the count") {
    val st = store()
    st.write(Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"))
      .toDF("doc_id", "v"), "t")
    val removed = Takedown.purge(st, "t", "doc_id", Seq(2L, 9L).toDF("id"))
    assert(removed === 2L) // both rows of doc 2; absent id 9 removes nothing
    assert(st.read("t").get.select($"doc_id").collect().map(_.getLong(0)).sorted
      === Array(1L, 3L))
    // a no-op purge leaves the table untouched and reports zero
    assert(Takedown.purge(st, "t", "doc_id", Seq(2L).toDF("id")) === 0L)
    // fail closed on a mistyped table
    intercept[RuntimeException] {
      Takedown.purge(st, "nope", "doc_id", Seq(1L).toDF("id"))
    }
    intercept[IllegalArgumentException] {
      Takedown.purge(st, "t", "doc_id", Seq((1L, 2L)).toDF("a", "b"))
    }
  }

  test("purging a line-index carrier RE-COOLS a line back under the hot gate") {
    // "shared" appears in 3 docs (> maxDf 2 -> dropped everywhere);
    // after doc 3's takedown it appears in 2 (<= 2) and RETURNS to the
    // surviving docs — the at-read-gate erasure guarantee
    val docs = Seq(
      (1L, "shared\nkeep1"), (2L, "shared\nkeep2"), (3L, "shared\nkeep3"))
      .toDF("doc_id", "text")
    val st = store()
    st.write(graft.dedup.Dedup.lineIndexRows(docs, "doc_id", "text"), "lines")
    val before = graft.dedup.Dedup.lineDedupFromIndex(
        st.read("lines").get, "doc_id", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("text_clean")).toMap
    assert(before === Map(1L -> "keep1", 2L -> "keep2", 3L -> "keep3"))
    assert(Takedown.purge(st, "lines", "doc_id", Seq(3L).toDF("id")) === 2L)
    val after = graft.dedup.Dedup.lineDedupFromIndex(
        st.read("lines").get, "doc_id", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("text_clean")).toMap
    assert(after === Map(1L -> "shared\nkeep1", 2L -> "shared\nkeep2"))
    // and it equals the from-scratch build over the survivors
    val scratch = graft.dedup.Dedup.lineDedup(
        docs.filter($"doc_id" < 3), "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("text_clean")).toMap
    assert(after === scratch)
  }

  test("tombstone records distinct ids, dedups re-submissions, reports the delta") {
    val st = store()
    assert(Takedown.tombstone(st, Seq(3L, 3L, 4L).toDF("id")) === 2L)
    // re-submitting an opt-out list is the norm — only novelty counts
    assert(Takedown.tombstone(st, Seq(4L, 5L).toDF("id")) === 1L)
    assert(Takedown.tombstone(st, Seq(3L).toDF("id")) === 0L)
    assert(st.read("tombstones").get.collect().map(_.getLong(0)).sorted
      === Array(3L, 4L, 5L))
    intercept[IllegalArgumentException] {
      Takedown.tombstone(st, Seq((1L, 2L)).toDF("a", "b"))
    }
  }

  test("withoutTombstones hides tombstoned rows at read and RE-COOLS hot lines") {
    // the ONLINE erasure guarantee: no purge, no stream stop — the
    // tombstone anti-join runs BEFORE the hotness gate, so df counts
    // never see tombstoned contributions (the purge-based sibling above,
    // with zero downtime)
    val docs = Seq(
      (1L, "shared\nkeep1"), (2L, "shared\nkeep2"), (3L, "shared\nkeep3"))
      .toDF("doc_id", "text")
    val st = store()
    st.write(graft.dedup.Dedup.lineIndexRows(docs, "doc_id", "text"), "lines")
    // no tombstone table yet: gate is a no-op
    assert(Takedown.withoutTombstones(st.read("lines").get, "doc_id", st)
      .count() === st.read("lines").get.count())
    Takedown.tombstone(st, Seq(3L).toDF("id"))
    val served = graft.dedup.Dedup.lineDedupFromIndex(
        Takedown.withoutTombstones(st.read("lines").get, "doc_id", st),
        "doc_id", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("text_clean")).toMap
    // doc 3 gone; "shared" re-cooled (2 <= maxDf) and returned to 1 and 2
    assert(served === Map(1L -> "shared\nkeep1", 2L -> "shared\nkeep2"))
    // the physical rows are still there for the deferred compaction purge
    assert(st.read("lines").get.filter($"doc_id" === 3L).count() > 0L)
    val scratch = graft.dedup.Dedup.lineDedup(
        docs.filter($"doc_id" < 3), "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("text_clean")).toMap
    assert(served === scratch)
  }

  test("compactTombstones: the deferred physical purge, serve-invariant, clears last") {
    val docs = Seq(
      (1L, "shared\nkeep1"), (2L, "shared\nkeep2"), (3L, "shared\nkeep3"))
      .toDF("doc_id", "text")
    val st = store()
    st.write(graft.dedup.Dedup.lineIndexRows(docs, "doc_id", "text"), "lines")
    Takedown.tombstone(st, Seq(3L).toDF("id"))
    def serve() = graft.dedup.Dedup.lineDedupFromIndex(
        Takedown.withoutTombstones(st.read("lines").get, "doc_id", st),
        "doc_id", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("text_clean")).toMap
    val before = serve()
    val counts = Takedown.compactTombstones(st, Seq(("lines", "doc_id")))
    assert(counts === Seq(("lines", 2L)))   // doc 3's two index rows
    // the physical purge changes NOTHING a reader can see: the at-read
    // gate already hid these rows — only the storage is reclaimed
    assert(serve() === before)
    assert(st.read("lines").get.filter($"doc_id" === 3L).count() === 0L)
    // the tombstone table cleared (LAST), so the gate's work list is empty
    assert(st.read("tombstones").get.count() === 0L)
    // idempotent: a re-run purges zero rows and stays clean
    assert(Takedown.compactTombstones(st, Seq(("lines", "doc_id")))
      === Seq(("lines", 0L)))
    // a store with no tombstone table compacts nothing
    assert(Takedown.compactTombstones(store(), Seq(("t", "id")))
      === Seq(("t", 0L)))
  }

  test("withoutTombstonesAny erases a pair when EITHER side is tombstoned") {
    val st = store()
    st.write(Seq(3L).toDF(Takedown.TombstoneCol), "tombstones")
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val served = Takedown.withoutTombstonesAny(pairs, Seq("id_a", "id_b"), st)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served === Set((1L, 2L), (5L, 6L)))
    // empty column list is a contract error; a missing tombstone table
    // gates nothing
    intercept[IllegalArgumentException] {
      Takedown.withoutTombstonesAny(pairs, Seq.empty, st)
    }
    val st2 = store()
    assert(Takedown.withoutTombstonesAny(pairs, Seq("id_a", "id_b"), st2)
      .count() === 4L)
  }

  test("purgeAll propagates one list through every table of the pipeline") {
    val st = store()
    st.write(Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"), "corpus")
    st.write(Seq((1L, 0L, "x"), (2L, 0L, "y")).toDF("doc_id", "pos", "line"),
      "lines")
    st.write(Seq((10L, 1L), (11L, 2L)).toDF("query_id", "doc_id"), "served")
    val counts = Takedown.purgeAll(st,
      Seq(("corpus", "doc_id"), ("lines", "doc_id"), ("served", "doc_id")),
      Seq(2L).toDF("id"))
    assert(counts === Seq(("corpus", 1L), ("lines", 1L), ("served", 1L)))
    assert(st.read("corpus").get.count() === 1L)
    assert(st.read("served").get.select($"doc_id").head.getLong(0) === 1L)
  }
}
