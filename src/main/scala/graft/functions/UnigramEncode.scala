package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer APPLY — segment each word of a token array into
  * the maximum-score piece sequence under a trained piece table (the
  * SentencePiece-unigram family: pieces carry log-probabilities and a
  * word's segmentation is the Viterbi argmax over all covers), in one
  * codegen'd pass. The BPE sibling ([[BpeApply]]) replays a merge LIST;
  * this one maximizes over a piece SET — the two tokenizer families a
  * modern LLM pipeline trains ([[graft.text.TextAnalysis.bpeTrain]] /
  * [[graft.text.Unigram.unigramTrain]]).
  *
  * Scores are INTEGER milli-log-probs (`scoreMilli` =
  * floor(1000·ln p), pinned at training time — [[graft.text.Unigram]]),
  * so the DP is exact integer arithmetic and the segmentation is
  * cross-engine deterministic: no float fold, no ULP drift, a DuckDB
  * list_reduce DP over the same integers reproduces it bit-for-bit
  * (graded, q166). Ties prefer the LONGER piece ending at the position
  * (candidates scan L ascending and replace on >=) — with equal totals
  * "the" segments [the], not [th, e]. A character absent from the piece
  * table scores `unkScoreMilli` as a single-char piece (the UNK floor —
  * only single chars fall back, so the DP is total and every word
  * segments); trained tables keep every seed character, so UNK fires
  * only on apply-time novelty.
  *
  * Cost: O(len · maxPieceLen) per word with O(1) hash probes — the piece
  * table rides into generated code as ONE reference object (the
  * [[BpeApply]] pattern; inlining a 100k-piece vocabulary as expressions
  * would not compile), and eval and codegen share one JVM helper so the
  * two paths cannot drift. The pieces field is a `Seq` (structural
  * equality — canonicalization/semanticEquals/CSE work; an `Array` or
  * HashMap field would give identity equals); the probe HashMap is
  * derived lazily per JVM and never participates in equality.
  */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Long)],
                         unkScoreMilli: Long)
    extends UnaryExpression {

  require(pieces.forall(_._1.nonEmpty),
    "UnigramEncode: every piece must be non-empty")
  require(pieces.map(_._1).distinct.length == pieces.length,
    "UnigramEncode: duplicate piece entries would make the argmax ambiguous")

  // derived per-JVM (transient: recomputed after executor deserialization
  // from the canonical Seq field)
  @transient private lazy val piecesMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }
  @transient private lazy val maxPieceLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_._1.length).max

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"UnigramEncode expects array<string>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    UnigramEncode.encode(input.asInstanceOf[ArrayData], piecesMap,
      maxPieceLen, unkScoreMilli)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("unigramPieces", piecesMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.UnigramEncode.encode(" +
        s"$a, $mapRef, $maxPieceLen, ${unkScoreMilli}L);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramEncode {

  def apply(c: Column, pieces: Seq[(String, Long)],
            unkScoreMilli: Long): Column =
    GraftColumnBridge.column(
      UnigramEncode(GraftColumnBridge.expression(c), pieces, unkScoreMilli))

  /** Shared eval/codegen core: Viterbi-segment every word of `words` and
    * flatten the pieces in order. A null ELEMENT encodes as zero pieces
    * (the [[BpeApply]] convention — the tokenizer never emits null
    * tokens; containsNull on the input type is tolerated). */
  def encode(words: ArrayData, piecesMap: java.util.HashMap[String, java.lang.Long],
             maxPieceLen: Int, unkScoreMilli: Long): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.numElements()) {
      val u = words.getUTF8String(i)
      if (u != null) encodeWord(u.toString, piecesMap, maxPieceLen,
        unkScoreMilli, out)
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(w: String,
                         m: java.util.HashMap[String, java.lang.Long],
                         maxLen: Int, unk: Long,
                         out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val n = w.length
    if (n == 0) return
    // bestScore(i) = max total over covers of w[0, i); bestLen(i) = the
    // winning final-piece length. Total: L = 1 always has a candidate
    // (vocab score or the UNK floor), so bestScore(i) is always set.
    val bestScore = new Array[Long](n + 1)
    val bestLen = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MinValue
      var bl = 0
      var L = 1
      val lMax = if (maxLen < i) maxLen else i
      while (L <= lMax) {
        val s = m.get(w.substring(i - L, i))
        // multi-char pieces must be in-vocab; single chars fall back to
        // the UNK floor so the DP is total
        val sc: Long =
          if (s != null) s.longValue()
          else if (L == 1) unk
          else Long.MinValue
        if (sc != Long.MinValue) {
          val cand = bestScore(i - L) + sc
          // >= with L ascending: ties prefer the LONGER piece
          if (cand >= best) { best = cand; bl = L }
        }
        L += 1
      }
      bestScore(i) = best
      bestLen(i) = bl
      i += 1
    }
    // reconstruct: walk back-lengths from the end, emit forward
    val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = n
    while (p > 0) { lens += bestLen(p); p -= bestLen(p) }
    var start = 0
    var k = lens.length - 1
    while (k >= 0) {
      out += UTF8String.fromString(w.substring(start, start + lens(k)))
      start += lens(k)
      k -= 1
    }
  }
}
