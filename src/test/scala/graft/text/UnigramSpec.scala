package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val pinned = Seq(
    // t + h = -3000 + -4000 = th's -7000: the planted TIE — longer wins
    ("t", -3000L), ("h", -4000L), ("e", -4000L), ("th", -7000L),
    ("the", -11000L), ("a", -3500L), ("n", -3800L), ("an", -6000L))

  test("viterbi ties prefer the longer piece (expression and reference agree)") {
    val got = Seq("the").toDF("w")
      .select(graft.functions.UnigramEncode(array(col("w")), pinned, -100000L).as("p"))
      .head.getSeq[String](0)
    // [t,h,e] = -11000, [th,e] = -11000, [the] = -11000: all tie -> longest
    assert(got === Seq("the"))
    assert(Unigram.viterbi("the", pinned.toMap, 3) === Seq("the"))
    // "an" beats "a"+"n" strictly (-6000 vs -7300)
    assert(Unigram.viterbi("an", pinned.toMap, 3) === Seq("an"))
  }

  test("unknown characters fall back to single-char UNK pieces") {
    val got = Seq("thx").toDF("w")
      .select(graft.functions.UnigramEncode(array(col("w")), pinned, -100000L).as("p"))
      .head.getSeq[String](0)
    assert(got === Seq("th", "x"))
    assert(Unigram.viterbi("thx", pinned.toMap, 3) === Seq("th", "x"))
    // an all-unknown word still segments (DP total)
    assert(Unigram.viterbi("zq", pinned.toMap, 3) === Seq("z", "q"))
  }

  test("expression core matches the independent reference on random-ish words") {
    val words = Seq("than", "hath", "ethane", "tnt", "aaa", "nahant")
    val got = words.toDF("w")
      .select(graft.functions.UnigramEncode(array(col("w")), pinned, -100000L).as("p"))
      .collect().map(_.getSeq[String](0).toList)
    val ref = words.map(w => Unigram.viterbi(w, pinned.toMap, 3).toList)
    assert(got.toSeq === ref)
    // segmentations cover: concatenation restores the word
    got.toSeq.zip(words).foreach { case (ps, w) => assert(ps.mkString === w) }
  }

  test("null token elements encode as zero pieces; empty words too") {
    val got = Seq(1).toDF("i")
      .select(graft.functions.UnigramEncode(
        array(lit("th"), lit(null).cast("string"), lit("e")), pinned, -100000L).as("p"))
      .head.getSeq[String](0)
    assert(got === Seq("th", "e"))
  }

  test("unigramTrain matches the brute-force reference (seed + 3 hard-EM rounds)") {
    val docs = Seq(
      "the theme then an another thane",
      "than the an anthem the the",
      "nathan hat hen ten net").toDF("text")
    val trained = Unigram.unigramTrain(docs, "text", maxPieceLen = 3,
      keepMulti = 6, rounds = 3)
    val wf = TextAnalysis.bpeWordTable(docs, "text")
      .select(col("__w"), col("__c")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = Unigram.unigramTrainReference(wf, maxPieceLen = 3,
      keepMulti = 6, rounds = 3)
    assert(trained === ref)
    // every character of the corpus stays encodable
    val chars = wf.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(trained.map(_.piece).toSet))
    // apply over a trained table reproduces training segmentations
    val scores = trained.map(p => p.piece -> p.scoreMilli).toMap
    val maxLen = trained.map(_.piece.length).max
    val enc = docs.select(explode(Unigram.unigramEncode(col("text"), trained)).as("p"))
      .collect().map(_.getString(0))
    val refEnc = wf.flatMap { case (w, _) => Unigram.viterbi(w, scores, maxLen) }
    assert(enc.sorted.toSeq === {
      // corpus order vs word-table order differ; compare as multisets of
      // per-word segmentations via sorted piece lists weighted by freq
      val all = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
        .collect().map(_.getString(0))
        .flatMap(w => Unigram.viterbi(w, scores, maxLen))
      all.sorted.toSeq
    })
    assert(refEnc.nonEmpty)
  }

  test("scores are floor-milli log-probs and the table is count-ordered") {
    val docs = Seq("aa ab aa").toDF("text")
    val t = Unigram.unigramTrain(docs, "text", maxPieceLen = 2, keepMulti = 2, rounds = 1)
    assert(t === t.sortBy(p => (-p.cnt, p.piece)))
    val total = t.map(_.cnt).sum
    t.foreach { p =>
      assert(p.scoreMilli ===
        math.floor(1000.0 * StrictMath.log(p.cnt.toDouble / total.toDouble)).toLong)
    }
  }

  test("viterbi honors a custom UNK floor, in lockstep with the expression") {
    // "xa"+"b" = -4000 vs "x"(unk)+"a"+"b" = unk-2000: the default floor
    // (-100000) keeps the in-vocab cover; a raised floor flips the argmax
    val scores = Map("xa" -> -3000L, "a" -> -1000L, "b" -> -1000L)
    assert(Unigram.viterbi("xab", scores, 2) === Seq("xa", "b"))
    assert(Unigram.viterbi("xab", scores, 2, unkScoreMilli = -1000L)
      === Seq("x", "a", "b"))
    val pieces = scores.toSeq.sorted
      .map { case (p, s) => Unigram.UnigramPiece(p, 1L, s) }
    Seq(Unigram.DefaultUnkScoreMilli, -1000L).foreach { unk =>
      val enc = Seq("xab").toDF("text")
        .select(Unigram.unigramEncode(col("text"), pieces, unk))
        .head.getSeq[String](0)
      assert(enc === Unigram.viterbi("xab", scores, 2, unk))
    }
  }
}
