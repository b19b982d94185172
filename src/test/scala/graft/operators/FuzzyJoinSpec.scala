package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(words: Seq[String]): Set[(String, String)] =
    FuzzyJoin.neighborPairs(words.toDF("w"), "w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("neighborPairs finds substitution, insertion, deletion, and no more") {
    val got = pairsOf(Seq("key", "kex", "keys", "ey", "table", "chair"))
    assert(got === Set(
      ("kex", "key"),   // substitution (shared variant "ke")
      ("key", "keys"),  // insertion: "key" is a deletion variant of "keys"
      ("ey", "key")))   // deletion
    // "xab"/"abx" share deletion variant "ab" but are distance 2 — the
    // levenshtein verify must reject what the blocking over-generates
    assert(pairsOf(Seq("xab", "abx")) === Set.empty)
  }

  test("neighborPairs excludes nulls/empties and dedups duplicate values") {
    val df = Seq(Some("aa"), Some("aa"), Some("ab"), Some(""), None)
      .toDF("w")
    val got = FuzzyJoin.neighborPairs(df, "w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("aa", "ab")))
  }

  test("neighborPairs maxDist=2 finds two-edit pairs the depth-1 blocking misses") {
    // "xab"/"abx" are distance 2: invisible at depth 1 (the verify
    // rejects them), found at depth 2 via shared double-deletion "ab"
    val d2 = FuzzyJoin.neighborPairs(Seq("xab", "abx").toDF("w"), "w", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(d2 === Set(("abx", "xab")))
    // two substitutions and a double-insert — radius-2 shapes; "keyers"
    // is distance 3 from "key" and must NOT pair
    val got = FuzzyJoin.neighborPairs(
        Seq("kettle", "cattle", "key", "keyer", "keyers", "table").toDF("w"),
        "w", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("cattle", "kettle"), ("key", "keyer"),
      ("keyer", "keyers")))
    // invalid radius fails fast
    intercept[IllegalArgumentException] {
      FuzzyJoin.neighborPairs(Seq("a").toDF("w"), "w", maxDist = 3)
    }
  }

  test("neighborPairs maxDist=2 == brute-force levenshtein<=2 on random corpora") {
    import org.scalacheck.{Gen, Test => SCTest, Prop}
    val wordGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val prop = Prop.forAll(Gen.listOfN(20, wordGen)) { ws =>
      val words = ws.distinct
      val want = (for {
        a <- words; b <- words if a < b
        if org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
          .apply(a, b) <= 2
      } yield (a, b)).toSet
      FuzzyJoin.neighborPairs(words.toDF("w"), "w", maxDist = 2)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("neighborPairs == brute-force levenshtein<=1 on random corpora") {
    import org.scalacheck.{Gen, Test => SCTest, Prop}
    val wordGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val prop = Prop.forAll(Gen.listOfN(25, wordGen)) { ws =>
      val words = ws.distinct
      val want = (for {
        a <- words; b <- words if a < b
        if org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
          .apply(a, b) <= 1
      } yield (a, b)).toSet
      pairsOf(words) == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
