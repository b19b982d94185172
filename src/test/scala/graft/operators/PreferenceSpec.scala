package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def rollouts(rows: (Long, Long, String, java.lang.Double)*) =
    rows.toDF("prompt_id", "completion_id", "completion", "score")

  private def mine(df: org.apache.spark.sql.DataFrame, minMargin: Double = 0.0) =
    Preference.pairs(df, "prompt_id", "completion_id", "completion",
      "score", minMargin)

  test("best-vs-worst per prompt with the margin") {
    val got = mine(rollouts(
      (1L, 10L, "bad", 1.0), (1L, 11L, "best", 9.0), (1L, 12L, "mid", 5.0)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(4), r.getString(5), r.getDouble(7), r.getLong(8)))
    assert(got === Array((1L, 11L, "best", 10L, "bad", 8.0, 3L)))
  }

  test("ties resolve to the LOWEST completion id on BOTH sides") {
    val got = mine(rollouts(
      (1L, 30L, "hi-b", 9.0), (1L, 20L, "hi-a", 9.0),
      (1L, 50L, "lo-b", 1.0), (1L, 40L, "lo-a", 1.0))).head
    assert(got.getLong(1) === 20L) // chosen: highest score, lowest id
    assert(got.getLong(4) === 40L) // rejected: lowest score, lowest id
  }

  test("no-signal prompts vanish: all-tie margin 0, and sub-margin pairs drop") {
    val d = rollouts(
      (1L, 1L, "a", 5.0), (1L, 2L, "b", 5.0),          // all tie
      (2L, 3L, "c", 5.0), (2L, 4L, "d", 4.0),          // margin 1
      (3L, 5L, "e", 9.0), (3L, 6L, "f", 2.0))          // margin 7
    assert(mine(d).select("prompt_id").as[Long].collect().sorted
      === Array(2L, 3L))
    assert(mine(d, minMargin = 3.0).select("prompt_id").as[Long].collect()
      === Array(3L))
  }

  test("NULL-score rollouts are dropped and do not count in n_rollouts") {
    val got = mine(rollouts(
      (1L, 1L, "a", 3.0), (1L, 2L, "b", 7.0), (1L, 3L, "unjudged", null)))
      .head
    assert(got.getLong(1) === 2L && got.getLong(4) === 1L)
    assert(got.getLong(8) === 2L) // n_rollouts counts SCORED rollouts
  }

  test("groupAdvantages: integer-exact numerators, the z identity, all-tie guard") {
    val got = Preference.groupAdvantages(rollouts(
      (1L, 1L, "a", 2.0), (1L, 2L, "b", 4.0), (1L, 3L, "c", 9.0),
      (2L, 4L, "d", 5.0), (2L, 5L, "e", 5.0),       // all-tie group
      (3L, 6L, "f", 7.0), (3L, 7L, "unjudged", null)),
      "prompt_id", "completion_id", "score").collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // prompt 1: n=3, S=15, Q=101 -> var_num = 3*101 - 225 = 78
    assert(got(1L) === ((3L, 3 * 2.0 - 15, 78.0)))
    assert(got(2L) === ((3L, 3 * 4.0 - 15, 78.0)))
    assert(got(3L) === ((3L, 3 * 9.0 - 15, 78.0)))
    // advantages sum to zero within a group (the baseline property)
    assert(Seq(1L, 2L, 3L).map(got(_)._2).sum === 0.0)
    // z = adv_num / sqrt(var_num): prompt 1's best is (27-15)/sqrt(78)
    assert(math.abs(got(3L)._2 / math.sqrt(got(3L)._3) - 12 / math.sqrt(78.0)) < 1e-12)
    // all-tie group: zero advantage, zero variance — no gradient
    assert(got(4L) === ((2L, 0.0, 0.0)) && got(5L) === ((2L, 0.0, 0.0)))
    // the NULL-score rollout drops and shrinks its group to n=1
    assert(got(6L) === ((1L, 0.0, 0.0)) && !got.contains(7L))
  }

  test("string ids tie-break identically on both sides (no id arithmetic)") {
    // UUID-shaped rollout ids: a negated-id ordering key would cast to
    // NULL and make tied winners partition-order-dependent
    val d = Seq(
      ("p1", "b-late", "hi-b", 9.0), ("p1", "a-early", "hi-a", 9.0),
      ("p1", "d-late", "lo-d", 1.0), ("p1", "c-early", "lo-c", 1.0))
      .toDF("prompt_id", "completion_id", "completion", "score")
    val got = Preference.pairs(d, "prompt_id", "completion_id",
      "completion", "score").head
    assert(got.getString(1) === "a-early") // chosen: lexically lowest id
    assert(got.getString(4) === "c-early") // rejected: lexically lowest id
    // ... and the streamed merge resolves the same cross-batch tie
    val merged = Preference.mergeCandidates(
      Preference.candidates(d.limit(1), "prompt_id", "completion_id",
        "completion", "score"),
      Preference.candidates(d.offset(1), "prompt_id", "completion_id",
        "completion", "score"),
      "prompt_id")
    val m = Preference.pairsFromCandidates(merged, "prompt_id").head
    assert(m.getString(1) === "a-early" && m.getString(4) === "c-early")
  }

  test("a MinValue score sentinel neither crashes (ANSI negate) nor inverts the ranking") {
    val d = Seq((1L, 1L, "failed", Long.MinValue), (1L, 2L, "good", 5L),
      (1L, 3L, "best", 9L))
      .toDF("prompt_id", "completion_id", "completion", "score")
    val got = Preference.pairs(d, "prompt_id", "completion_id",
      "completion", "score").head
    assert(got.getString(2) === "best" && got.getString(5) === "failed")
  }

  test("score column resolution is case-insensitive like col() itself") {
    val d = Seq((1L, 1L, "a", 1.0), (1L, 2L, "b", 9.0))
      .toDF("prompt_id", "completion_id", "completion", "Score")
    assert(Preference.pairs(d, "prompt_id", "completion_id", "completion",
      "score").head.getString(2) === "b")
    val e = intercept[IllegalArgumentException] {
      Preference.pairs(d, "prompt_id", "completion_id", "completion", "reward")
    }
    assert(e.getMessage.contains("not found"))
  }

  test("a non-numeric score column fails loud (it would silently cast)") {
    val d = Seq((1L, 1L, "a", "9.0"))
      .toDF("prompt_id", "completion_id", "completion", "score")
    for (thunk <- Seq(
      () => Preference.pairs(d, "prompt_id", "completion_id", "completion", "score"),
      () => Preference.groupAdvantages(d, "prompt_id", "completion_id", "score"))) {
      val e = intercept[IllegalArgumentException](thunk())
      assert(e.getMessage.contains("must be numeric"))
    }
  }

  test("property: the candidate merge is order-invariant over any batch split (the q274 law)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rolloutGen = for {
      prompt <- Gen.choose(0L, 3L)
      id <- Gen.choose(0L, 40L)
      score <- Gen.choose(0L, 4L) // small range -> ties are common
    } yield (prompt, id, s"t$id", score)
    def cands(rows: Seq[(Long, Long, String, Long)]) =
      Preference.candidates(rows.toDF("prompt_id", "completion_id",
        "completion", "score"), "prompt_id", "completion_id",
        "completion", "score")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        Option(r.getStruct(1)).map(s => (s.getLong(0), s.getLong(2))),
        Option(r.getStruct(2)).map(s => (s.getLong(0), s.getLong(2))),
        r.getLong(3))).toSet
    val prop = Prop.forAll(Gen.nonEmptyListOf(rolloutGen),
      Gen.choose(1, 1000)) { (rows0, cut0) =>
      // pad single-row lists so EVERY iteration exercises a real split
      // (an empty side would reduce the property to a tautology), and
      // let the cut land anywhere in [1, size-1]
      val rows = if (rows0.size < 2) rows0 ++ rows0 else rows0
      val cut = 1 + cut0 % (rows.size - 1)
      val (a, b) = rows.splitAt(cut)
      val direct = snap(cands(rows))
      // fold in BOTH orders: associative+commutative with deterministic
      // tie-breaks means every fold order equals the one-shot build
      val ab = snap(Preference.mergeCandidates(cands(a), cands(b), "prompt_id"))
      val ba = snap(Preference.mergeCandidates(cands(b), cands(a), "prompt_id"))
      ab == direct && ba == direct
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("a negative minMargin fails loud") {
    val e = intercept[IllegalArgumentException] {
      mine(rollouts((1L, 1L, "a", 1.0)), minMargin = -1.0)
    }
    assert(e.getMessage.contains("minMargin"))
  }
}
