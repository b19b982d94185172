package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangProfileSpec extends SparkSpec {
  import spark.implicits._

  private val labeled = Seq(
    (1L, "x", "aaaa"),   // trigrams: aaa ×2
    (2L, "x", "aaab"),   // aaa, aab
    (3L, "y", "bbbb"),   // bbb ×2
    (4L, "y", "bbba")    // bbb, bba
  ).toDF("doc_id", "lang", "text")

  test("charTrigrams: word-boundary collapse, short-text empty") {
    val got = Seq("Ab  cD", "ab", "").toDF("t")
      .select(LangProfile.charTrigrams(col("t")).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("ab_", "b_c", "_cd"))   // "ab_cd"
    assert(got(1) === Seq.empty)                   // len 2: no trigram
    assert(got(2) === Seq.empty)
  }

  test("trainProfiles: per-language top-k ranks with the (cnt DESC, g ASC) order") {
    val p = LangProfile.trainProfiles(labeled, "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(p === Map(("x", "aaa") -> 0L, ("x", "aab") -> 1L,
      ("y", "bbb") -> 0L, ("y", "bba") -> 1L))
  }

  test("classify: out-of-place distance, missing-trigram penalty, tie to lang ASC") {
    val profiles = LangProfile.trainProfiles(labeled, "lang", "text", k = 2)
    val docs = Seq(
      (10L, "aaaa"),  // [aaa r0] vs x: 0; vs y: penalty 2 -> x, 0
      (11L, "aaba"),  // [aab r0, aba r1] vs x: |0-1| + 2 = 3; vs y: 4 -> x, 3
      (12L, "cccc"),  // [ccc] missing both: 2 vs 2 -> tie, lang ASC -> x
      (13L, "bbba"),  // [bba dr0, bbb dr1] (g ASC at equal counts!) vs
                      // y's [bbb r0, bba r1]: |0-1| + |1-0| = 2 -> y, 2
      (14L, "bb")     // no trigrams: no output row
    ).toDF("doc_id", "text")
    val got = LangProfile.classify(docs, "doc_id", "text", profiles, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === Map(10L -> (("x", 0L)), 11L -> (("x", 3L)),
      12L -> (("x", 2L)), 13L -> (("y", 2L))))
  }

  test("pinned lowercase map folds Latin-1 uppercase, leaves the rest alone") {
    // the pair strings line up 1:1 and cover A-Z + À-Ö + Ø-Þ
    assert(LangProfile.PinnedUpper.length === LangProfile.PinnedLower.length)
    assert(LangProfile.PinnedUpper.zip(LangProfile.PinnedLower)
      .forall { case (u, l) => (u + 0x20).toChar == l })
    val got = Seq((1L, "ÜBer Äh ÑO ß"))
      .toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.translate(
        org.apache.spark.sql.functions.col("text"),
        LangProfile.PinnedUpper, LangProfile.PinnedLower))
      .head.getString(0)
    assert(got === "über äh ño ß") // ß untouched (already lowercase)
  }

  test("charTrigramsPinned classifies an accented corpus with pinnedLower end to end") {
    val labeled = Seq(
      (1L, "fr", "Élève Déjà Côté Être Noël Français"),
      (2L, "fr", "Déjà Élève Où Ça Été Fenêtre"),
      (3L, "de", "Über Größe Müde Schön Tür Änderung"),
      (4L, "de", "Straße Über Köln Füße Ärger Übung"))
      .toDF("doc_id", "lang", "text")
    val profiles = LangProfile.trainProfiles(labeled, "lang", "text",
      k = 20, pinnedLower = true)
    // the profile trigrams are all lowercase under the PINNED map
    val gs = profiles.collect().map(_.getString(1))
    assert(gs.forall(g => g == g.map(c =>
      if (LangProfile.PinnedUpper.contains(c)) (c + 0x20).toChar else c)))
    val got = LangProfile.classify(labeled, "doc_id", "text", profiles,
        k = 20, pinnedLower = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "fr", 2L -> "fr", 3L -> "de", 4L -> "de"))
  }

  test("degenerate arguments are rejected") {
    intercept[IllegalArgumentException] {
      LangProfile.trainProfiles(labeled, "lang", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      LangProfile.classify(labeled.withColumnRenamed("doc_id", "pred_lang"),
        "pred_lang", "text",
        LangProfile.trainProfiles(labeled, "lang", "text", 2), k = 2)
    }
  }
}
