package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** O9 upsert algebra: upsert(base, delta) == last-writer-wins map union
  * (the relational meaning of INSERT .. ON CONFLICT DO UPDATE). */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("delta wins on key conflict; unmatched rows from both sides survive") {
    val base  = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val delta = Seq((2, "B"), (3, "C")).toDF("k", "v")
    val out = Merge.upsert(base, delta, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(1 -> "a", 2 -> "B", 3 -> "C"))
  }

  test("no-PK fallback upserts on all columns: insert-if-identical-row-absent") {
    val base  = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val delta = Seq((2, "b"), (3, "c")).toDF("k", "v")
    val out = Merge.upsertAllColumns(base, delta).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out === Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("upsertPlan (custom Upsert node + ResolveUpsert rule) matches upsert()") {
    val base  = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val delta = Seq((2, "B"), (3, "C")).toDF("k", "v")
    val viaPlan = Merge.upsertPlan(base, delta, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(viaPlan === Map(1 -> "a", 2 -> "B", 3 -> "C"))
    // the custom node must be fully expanded — standard operators only
    val analyzed = org.apache.spark.sql.GraftColumnBridge
      .logicalPlan(Merge.upsertPlan(base, delta, Seq("k")))
    assert(!analyzed.exists(_.isInstanceOf[graft.plans.Upsert]))
  }

  test("property: upsert == last-writer-wins map union") {
    val kvGen = Gen.mapOf(Gen.zip(Gen.choose(0, 30), Gen.alphaStr.map(_.take(5))))
    val prop = Prop.forAll(kvGen, kvGen) { (b: Map[Int, String], d: Map[Int, String]) =>
      val out = Merge.upsert(b.toSeq.toDF("k", "v"), d.toSeq.toDF("k", "v"), Seq("k"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      out == (b ++ d)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
