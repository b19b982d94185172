package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def m(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("rowChecks: one pass, NULL predicate counts as violation") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, -5L), (3L, null), (null, 7L)).toDF("id", "v")
    val r = m(Expectations.rowChecks(df, Seq(
      "id_not_null" -> col("id").isNotNull,
      "v_positive" -> (col("v") > 0),
      "always" -> lit(true))))
    assert(r("id_not_null") === ((4L, 1L, 0L)))
    // v > 0: -5 fails, NULL fails (cannot satisfy)
    assert(r("v_positive") === ((4L, 2L, 0L)))
    assert(r("always") === ((4L, 0L, 1L)))
  }

  test("uniqueCheck: surplus duplicates and NULL keys both violate") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "a"), (2L, "b"), (null, "c")).toDF("k", "x")
    val r = m(Expectations.uniqueCheck(df, "k_unique", Seq("k")))
    // 4 rows, 3 distinct key structs -> 1 surplus, + 1 null-keyed
    assert(r("k_unique") === ((4L, 2L, 0L)))
    val ok = m(Expectations.uniqueCheck(
      Seq((1L, "a"), (2L, "b")).toDF("k", "x"), "ok", Seq("k")))
    assert(ok("ok") === ((2L, 0L, 1L)))
  }

  test("refCheck: orphans counted, NULL fks tolerated") {
    val ref = Seq(1L, 2L).toDF("pk")
    val df = Seq[java.lang.Long](1L, 2L, 9L, null).toDF("fk")
    val r = m(Expectations.refCheck(df, "fk_in_ref", "fk", ref, "pk"))
    assert(r("fk_in_ref") === ((4L, 1L, 0L)))
  }

  test("all() stacks reports") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val rep = Expectations.all(
      Expectations.rowChecks(df, Seq("a_pos" -> (col("a") > 0))),
      Expectations.uniqueCheck(df, "a_unique", Seq("a")))
    assert(rep.count() === 2)
    assert(rep.columns.toSeq ===
      Seq("check_name", "n_rows", "n_violations", "pass"))
  }

  test("kAnonymity reports only under-k combos; NULLs form combos; k < 2 rejected") {
    import spark.implicits._
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq(("DE", "A")) ++ Seq.fill(3)((null: String, "A")))
      .toDF("country", "segment")
    val got = Expectations.kAnonymity(df, Seq("country", "segment"), k = 4L)
      .collect().map(r => (Option(r.getString(0)).orNull, r.getString(1), r.getLong(2))).toSet
    // (US, A) has 5 >= 4: not reported; the others are under k
    assert(got === Set(("US", "B", 2L), ("DE", "A", 1L), (null, "A", 3L)))
    intercept[IllegalArgumentException] {
      Expectations.kAnonymity(df, Seq("country"), k = 1L)
    }
    intercept[IllegalArgumentException] {
      Expectations.kAnonymity(df, Seq.empty, k = 4L)
    }
  }
}
