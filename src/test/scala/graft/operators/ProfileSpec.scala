package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact per-column stats in one pass, integral min/max only") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.5), (2L, "a", null), (2L, null, 2.5), (7L, "b", 2.5))
      .toDF("k", "s", "d")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(p("k") === Seq(4L, 0L, 3L, 1L, 7L))
    assert(p("s") === Seq(4L, 1L, 2L, null, null))  // distinct skips NULL
    assert(p("d") === Seq(4L, 1L, 2L, null, null))  // double: no min/max
  }

  test("approxDistinct mode stays exact at tiny cardinality and keeps the schema") {
    val df = Seq((1L, "x"), (2L, "y"), (2L, "y")).toDF("k", "s")
    val exact = Profile.profile(df).orderBy("col_name").collect().map(_.toSeq)
    val approx = Profile.profile(df, approxDistinct = true)
      .orderBy("col_name").collect().map(_.toSeq)
    assert(exact.toSeq === approx.toSeq)
  }

  test("map columns profile with NULL n_distinct instead of crashing") {
    val df = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2))).toDF("k", "m")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(p("m") === Seq(2L, 0L, null, null, null)) // counts, no distinct
    assert(p("k") === Seq(2L, 0L, 2L, 1L, 2L))       // siblings unaffected
  }

  test("all-NULL integral column yields NULL min/max, full null count") {
    val df = Seq[java.lang.Long](null, null).toDF("k")
    val r = Profile.profile(df).head
    assert(r.toSeq === Seq("k", 2L, 2L, 0L, null, null))
  }

  test("empty table profiles to zero counts instead of NPE") {
    // sum() over zero rows aggregates to NULL — the n_nulls read must pin
    // it to 0 like the other positional reads (profiling an empty table
    // is a legitimate ops case: a not-yet-populated sync target)
    val df = Seq((1L, "x")).toDF("k", "s").filter(lit(false))
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(p("k") === Seq(0L, 0L, 0L, null, null))
    assert(p("s") === Seq(0L, 0L, 0L, null, null))
  }

  test("exotic column names profile: dots, backticks, case collisions") {
    // exactly the unfamiliar-schema shapes the operator exists for — a
    // dotted name must not parse as a struct path, a backticked name must
    // not break the quoting, and case-colliding names must not cross wires
    val df = Seq((1L, 2L, "x"), (5L, 6L, null), (9L, 10L, "x"))
      .toDF("a.b", "A`B", "ab")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(p("a.b") === Seq(3L, 0L, 3L, 1L, 9L))
    assert(p("A`B") === Seq(3L, 0L, 3L, 2L, 10L))
    assert(p("ab") === Seq(3L, 1L, 1L, null, null))
  }
}
