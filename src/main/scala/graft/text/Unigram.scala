package graft.text

import graft.functions.UnigramEncode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Unigram-LM tokenizer training — the OTHER tokenizer family next to BPE
  * ([[TextAnalysis.bpeTrain]]): instead of growing a merge list bottom-up,
  * start from a large substring candidate set and iterate hard-EM rounds
  * (Viterbi-segment every word under the current piece scores → recount
  * piece frequencies from the segmentations → rescore), keeping the top
  * pieces each round. The SentencePiece-unigram shape with hard (argmax)
  * E-steps, which keeps every quantity integral and the whole train
  * cross-engine deterministic.
  *
  * Determinism contract: piece scores are INTEGER milli-log-probs
  * computed ON THE DRIVER as floor(1000 · StrictMath.log(cnt/total)) —
  * counts are exact integer sums (order-independent under any partition
  * fold), each piece's score depends on one double op from two integers
  * (bit-exact on every JVM), and the Viterbi DP
  * ([[graft.functions.UnigramEncode]]) is pure integer arithmetic with a
  * total (score, then longer-piece) tie order. Same corpus → same
  * vocabulary, same scores, same segmentations, on any cluster layout
  * (graded against an in-query brute-force Scala trainer, q165 — the
  * q150 contract).
  *
  * Scale shape: the corpus is touched ONCE — [[TextAnalysis.bpeWordTable]]
  * collapses it to the distinct-word frequency table, localCheckpoint'd
  * and reused by the seed count and every round. Per round: one narrow
  * codegen'd segmentation projection over |vocab-distinct-words| rows
  * (the piece table rides as a reference object — no join, no shuffle),
  * one partial-aggregated piece count, and one vocabulary-BOUNDED collect
  * (keepMulti + alphabet rows — the [[Vocab.collectVocab]] bound; the
  * driver never sees a corpus-sized row set). Single-char pieces are
  * alphabet-bounded by the tokenizer's [a-z0-9] class. */
object Unigram {

  /** A trained piece: its segmentation-weighted corpus count and its
    * pinned integer milli-log-prob score. */
  final case class UnigramPiece(piece: String, cnt: Long, scoreMilli: Long)

  /** The apply-time score for a single character absent from the piece
    * table — low enough that any in-vocab cover beats an UNK fallback,
    * high enough that sums over a word stay far from Long range. */
  val DefaultUnkScoreMilli: Long = -100000L

  /** floor(1000 · ln(cnt/total)) — the one float op in the pipeline,
    * driver-evaluated, StrictMath so it is bit-identical on every JVM
    * (and in the q165 in-query reference). */
  private[text] def scoreMilli(cnt: Long, total: Long): Long =
    math.floor(1000.0 * StrictMath.log(cnt.toDouble / total.toDouble)).toLong

  /** Substring candidate counts over a symbolized word table
    * ([[TextAnalysis.bpeWordTable]]'s (__w, __c)): every substring of
    * length 1..maxPieceLen of every distinct word, corpus-weighted —
    * (piece, cnt). The unigram seed heuristic (overlapping substrings
    * deliberately over-count; the EM rounds correct the weights).
    * |vocab|·len·maxPieceLen rows pre-combine, piece-bounded after. */
  def substringCounts(words: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1,
      s"Unigram.substringCounts: maxPieceLen must be >= 1, got $maxPieceLen")
    // per length L: guard len >= L before sequence(1, len-L+1) — Spark's
    // sequence(1, 0) would COUNT DOWN, not produce an empty array
    val subs = (1 to maxPieceLen).map { l =>
      when(length(col("__w")) >= l,
        transform(sequence(lit(1), length(col("__w")) - (l - 1)),
          i => col("__w").substr(i, lit(l))))
        .otherwise(array())
    }
    words.select(explode(flatten(array(subs: _*))).as("piece"), col("__c"))
      .groupBy("piece").agg(sum(col("__c")).cast(LongType).as("cnt"))
  }

  /** Train a unigram-LM piece table: seed from substring counts (ALL
    * single chars — coverage can never be lost — plus the top `keepMulti`
    * multi-char substrings), then `rounds` hard-EM rounds of
    * Viterbi-segment → recount → rescore, keeping the top `keepMulti`
    * multi-char pieces each round (single chars persist with a count
    * floor of 1 so their log-prob stays finite even when segmentations
    * stop using them). Returns the final table sorted (cnt DESC, piece) —
    * a total order, ties at the keep boundary included.
    *
    * Driver traffic per round: one (keepMulti + alphabet)-bounded
    * collect. Corpus traffic: zero after the word table materializes. */
  def unigramTrain(df: DataFrame, textCol: String, maxPieceLen: Int,
                   keepMulti: Int, rounds: Int): Seq[UnigramPiece] = {
    require(keepMulti >= 0, s"Unigram.unigramTrain: keepMulti must be >= 0, got $keepMulti")
    require(rounds >= 0, s"Unigram.unigramTrain: rounds must be >= 0, got $rounds")
    val words = TextAnalysis.bpeWordTable(df, textCol)
      .select(col("__w"), col("__c")).localCheckpoint()
    try {
      val seedRows = collectKept(substringCounts(words, maxPieceLen), keepMulti)
      val singles = seedRows.iterator.map(_._1).filter(_.length == 1).toSet
      var pieces = rescore(seedRows)
      var r = 0
      while (r < rounds) {
        val seg = UnigramEncode(array(col("__w")),
          pieces.map(p => (p.piece, p.scoreMilli)), DefaultUnkScoreMilli)
        val counts = words
          .select(explode(seg).as("piece"), col("__c"))
          .groupBy("piece").agg(sum(col("__c")).cast(LongType).as("cnt"))
        val kept = keepRound(collectKept(counts, keepMulti), singles)
        pieces = rescore(kept)
        r += 1
      }
      pieces
    } finally graft.Checkpoints.release(words)
  }

  /** The graded brute-force reference ([[unigramTrain]]'s q165 twin, the
    * q150 pattern): the IDENTICAL seed/segment/recount/rescore loop over
    * a driver-side word-frequency array, sharing nothing with the
    * distributed path but [[scoreMilli]] and the DP tie rule (its Viterbi
    * is an independent reimplementation — the expression core under test
    * is NOT reused). Grading-only: O(|vocab| · rounds) on one thread. */
  def unigramTrainReference(wordFreqs: Seq[(String, Long)], maxPieceLen: Int,
                            keepMulti: Int, rounds: Int): Seq[UnigramPiece] = {
    // seed: substring counts
    val seedCounts = scala.collection.mutable.Map.empty[String, Long]
    wordFreqs.foreach { case (w, c) =>
      var l = 1
      while (l <= maxPieceLen) {
        var i = 0
        while (i + l <= w.length) {
          val p = w.substring(i, i + l)
          seedCounts(p) = seedCounts.getOrElse(p, 0L) + c
          i += 1
        }
        l += 1
      }
    }
    val seedKept = keepTop(seedCounts.toSeq, keepMulti)
    val singles = seedKept.iterator.map(_._1).filter(_.length == 1).toSet
    var pieces = rescore(seedKept)
    var r = 0
    while (r < rounds) {
      val scores = pieces.map(p => p.piece -> p.scoreMilli).toMap
      val maxLen = if (pieces.isEmpty) 1 else pieces.iterator.map(_.piece.length).max
      val counts = scala.collection.mutable.Map.empty[String, Long]
      wordFreqs.foreach { case (w, c) =>
        viterbi(w, scores, maxLen).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      pieces = rescore(keepRound(keepTop(counts.toSeq, keepMulti), singles))
      r += 1
    }
    pieces
  }

  /** Independent driver-side Viterbi (grading-only): same integer DP,
    * same L-ascending >= tie rule as [[graft.functions.UnigramEncode]],
    * reimplemented over plain collections. `unkScoreMilli` must match the
    * expression's UNK floor or the two argmax covers diverge on any word
    * with an out-of-vocab character. */
  def viterbi(w: String, scores: Map[String, Long],
              maxLen: Int,
              unkScoreMilli: Long = DefaultUnkScoreMilli): Seq[String] = {
    if (w.isEmpty) return Seq.empty
    val n = w.length
    val bestScore = new Array[Long](n + 1)
    val bestLen = new Array[Int](n + 1)
    for (i <- 1 to n) {
      var best = Long.MinValue
      var bl = 0
      for (l <- 1 to math.min(maxLen, i)) {
        val sc = scores.get(w.substring(i - l, i)) match {
          case Some(s)            => s
          case None if l == 1     => unkScoreMilli
          case None               => Long.MinValue
        }
        if (sc != Long.MinValue) {
          val cand = bestScore(i - l) + sc
          if (cand >= best) { best = cand; bl = l }
        }
      }
      bestScore(i) = best
      bestLen(i) = bl
    }
    val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = n
    while (p > 0) { lens += bestLen(p); p -= bestLen(p) }
    lens.reverse.foldLeft((0, Vector.empty[String])) { case ((s, acc), l) =>
      (s + l, acc :+ w.substring(s, s + l))
    }._2
  }

  /** Tokenize-and-unigram-encode: the APPLY side of [[unigramTrain]] —
    * text word-tokenizes by the SAME [[TextAnalysis.tokens]] expression
    * the trainer's word table used, then each word segments by the
    * integer Viterbi ([[graft.functions.UnigramEncode]]) under the FINAL
    * trained scores — deterministically for seen and unseen words alike,
    * unseen CHARACTERS by the UNK floor. (Unlike BPE's in-order replay,
    * the final scores are an artifact of the last recount, not the
    * producer of the last segmentation — the apply contract is "argmax
    * under the shipped table", the same as SentencePiece's.) Feed the pieces to [[Vocab.buildFromTokens]]/`encodeTokens`
    * for id assignment — train → apply → ids, the q157 tail. */
  def unigramEncode(c: Column, pieces: Seq[UnigramPiece],
                    unkScoreMilli: Long = DefaultUnkScoreMilli): Column =
    UnigramEncode(TextAnalysis.tokens(c),
      pieces.map(p => (p.piece, p.scoreMilli)), unkScoreMilli)

  // ---- shared driver-side helpers (both the trainer and its reference
  // use these: selection and scoring are CONTRACT, not implementation) --

  /** Keep ALL single-char rows plus the top `keepMulti` multi-char rows
    * by (cnt DESC, piece ASC) — a total order, deterministic through
    * count ties at the boundary. */
  private def keepTop(rows: Seq[(String, Long)], keepMulti: Int): Seq[(String, Long)] = {
    val (single, multi) = rows.partition(_._1.length == 1)
    single ++ multi.sortBy { case (p, c) => (-c, p) }.take(keepMulti)
  }

  /** Collect the kept piece rows of a (piece, cnt) DataFrame — bounded:
    * single-char rows (alphabet-sized) plus a top-`keepMulti` LIMIT
    * applied BEFORE the collect (per-partition heaps, never a full
    * vocabulary on the driver). */
  private def collectKept(counts: DataFrame, keepMulti: Int): Seq[(String, Long)] = {
    val single = counts.filter(length(col("piece")) === 1)
    val multi = counts.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(keepMulti)
    single.unionByName(multi).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Post-round keep rule: top multi-char pieces by recount, plus EVERY
    * seed single char with a count floor of 1 (coverage: a char whose
    * segmentations stopped using it must stay encodable with a finite
    * log-prob). */
  private def keepRound(rows: Seq[(String, Long)],
                        singles: Set[String]): Seq[(String, Long)] = {
    val counted = rows.toMap
    val multi = rows.filter(_._1.length >= 2)
    val single = singles.toSeq.sorted.map(s => (s, math.max(counted.getOrElse(s, 0L), 1L)))
    single ++ multi
  }

  /** Normalize counts to integer milli-log-prob scores and fix the
    * return order: (cnt DESC, piece ASC). */
  private def rescore(rows: Seq[(String, Long)]): Seq[UnigramPiece] = {
    val total = rows.iterator.map(_._2).sum
    rows.map { case (p, c) => UnigramPiece(p, c, scoreMilli(c, total)) }
      .sortBy(p => (-p.cnt, p.piece))
  }
}
