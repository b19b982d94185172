package graft.sync

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private val before = Seq(
    (1L, Some("a"), 10L),  // unchanged -> omitted
    (2L, Some("b"), 20L),  // value change
    (3L, Some("c"), 30L),  // removed
    (4L, None: Option[String], 40L), // null -> value change
    (5L, Some("e"), 50L))  // value -> null change
    .toDF("id", "name", "v")

  private val after = Seq(
    (1L, Some("a"), 10L),
    (2L, Some("b"), 21L),
    (4L, Some("d"), 40L),
    (5L, None: Option[String], 50L),
    (6L, Some("f"), 60L))  // added
    .toDF("id", "name", "v")

  test("snapshotDiff classifies added/removed/changed, null-safe, delta only") {
    val out = Diff.snapshotDiff(before, after, Seq("id"), Seq("name", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "changed", 3L -> "removed", 4L -> "changed",
      5L -> "changed", 6L -> "added"))
  }

  test("identical snapshots produce an empty diff") {
    assert(Diff.snapshotDiff(before, before, Seq("id"), Seq("name", "v")).count() === 0L)
  }

  test("composite keys join on all key columns") {
    val b = Seq((1L, "x", 10L), (1L, "y", 20L)).toDF("k1", "k2", "v")
    val a = Seq((1L, "x", 10L), (1L, "y", 99L)).toDF("k1", "k2", "v")
    val out = Diff.snapshotDiff(b, a, Seq("k1", "k2"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(out === Map((1L, "y") -> "changed"))
  }

  test("diff over pk-bucketed snapshots plans ZERO exchanges") {
    import graft.operators.Bucketing
    val sql = spark
    try {
      Bucketing.writeBucketed(before, "graft_diffspec_b", Seq("id"), 4)
      Bucketing.writeBucketed(after, "graft_diffspec_a", Seq("id"), 4)
      // disable broadcast so the sort-merge path — the 100 TB shape — runs
      sql.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val diff = Diff.snapshotDiff(
        sql.table("graft_diffspec_b"), sql.table("graft_diffspec_a"),
        Seq("id"), Seq("name", "v"))
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed diff must not shuffle:\n$plan")
      assert(diff.count() === 5L) // same delta as the unbucketed path
    } finally {
      sql.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      sql.sql("DROP TABLE IF EXISTS graft_diffspec_b")
      sql.sql("DROP TABLE IF EXISTS graft_diffspec_a")
    }
  }

  test("schemaDiff reports added/removed/retyped columns, nothing else, sorted") {
    import spark.implicits._
    val before = Seq((1L, "a", 2.0)).toDF("id", "name", "score")
    val after = Seq((1, "a", true)).toDF("id", "name", "active")
    val got = Diff.schemaDiff(before, after).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(
      ("active", "added", "-", "boolean"),
      ("id", "retyped", "bigint", "int"),
      ("score", "removed", "double", "-")))
    // identical schemas produce an EMPTY report (delta-sized)
    assert(Diff.schemaDiff(before, before).count() === 0L)
  }

  test("schemaDiff surfaces nullability drift as its own change class") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val before = Seq((1L, "a")).toDF("id", "name")
    // coalesce with a non-null literal flips nullable -> not null; the
    // type string alone is unchanged, so a type-only diff would be empty
    val after = before.withColumn("name", coalesce(col("name"), lit("")))
    val got = Diff.schemaDiff(before, after).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(("name", "renullabled", "string", "string not null")))
    // and the reverse flip reports from the other side
    val back = Diff.schemaDiff(after, before).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(back.toSeq === Seq(("name", "renullabled", "string not null", "string")))
    // a retype DOMINATES: type change + nullability change is one
    // retyped row on plain type strings, never two rows
    val retyped = Diff.schemaDiff(before, before.withColumn("name", lit(1)))
    assert(retyped.collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("name", "retyped")))
  }
}
