package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer APPLY — segment each word of a token array by
  * GREEDY LONGEST-MATCH-FIRST under a trained vocabulary (the BERT
  * tokenizer family: non-initial pieces carry the `##` continuation
  * prefix), in one codegen'd pass. The third tokenizer family next to
  * BPE's merge-list replay ([[BpeApply]]) and unigram-LM's Viterbi argmax
  * ([[UnigramEncode]]): BPE replays an ORDERED list, unigram maximizes a
  * SCORE over a set, WordPiece matches a plain SET greedily — no scores
  * at apply time at all, which is why it is the cheapest of the three to
  * serve.
  *
  * Semantics (the canonical WordpieceTokenizer contract): per word, scan
  * from the current position for the LONGEST substring that — prefixed
  * with `##` when the position is word-internal — is in the vocabulary;
  * emit it and advance. If NO length matches at some position, or the
  * word exceeds `maxInputChars`, the ENTIRE word becomes one `unkToken`
  * (never a partial piece list — the all-or-nothing rule). Matching is
  * pure set membership on exact strings, so the segmentation is
  * trivially cross-engine deterministic — a DuckDB list_reduce walk over
  * the same vocabulary literal reproduces it string-for-string (graded,
  * q180).
  *
  * Cost: O(len · maxPieceLen) substring probes per word with O(1) hash
  * lookups — the vocabulary rides into generated code as ONE reference
  * object (the [[BpeApply]]/[[UnigramEncode]] pattern), and eval and
  * codegen share one JVM helper so the two paths cannot drift. The vocab
  * field is a `Seq` (structural equality — canonicalization /
  * semanticEquals / CSE work); the probe HashSet is derived lazily per
  * JVM and never participates in equality.
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
                           unkToken: String, maxInputChars: Int)
    extends UnaryExpression {

  require(vocab.forall(v => v.nonEmpty && v != "##"),
    "WordPieceEncode: vocab entries must be non-empty and carry content past '##'")
  require(vocab.distinct.length == vocab.length,
    "WordPieceEncode: duplicate vocab entries")
  require(unkToken.nonEmpty, "WordPieceEncode: unkToken must be non-empty")
  require(maxInputChars >= 1,
    s"WordPieceEncode: maxInputChars must be >= 1, got $maxInputChars")

  // derived per-JVM (transient: recomputed after executor deserialization
  // from the canonical Seq field)
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  // longest candidate worth probing at word start / word-internal
  // positions (a cap on the scan, not a semantic knob: membership fails
  // beyond these lengths anyway)
  @transient private lazy val maxPlainLen: Int =
    vocab.iterator.filterNot(_.startsWith("##")).map(_.length)
      .foldLeft(0)(math.max)
  @transient private lazy val maxContLen: Int =
    vocab.iterator.filter(_.startsWith("##")).map(_.length - 2)
      .foldLeft(0)(math.max)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"WordPieceEncode expects array<string>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    WordPieceEncode.encode(input.asInstanceOf[ArrayData], vocabSet,
      maxPlainLen, maxContLen, unkToken, maxInputChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordPieceVocab", vocabSet, "java.util.HashSet")
    val unkRef = ctx.addReferenceObj("wordPieceUnk", unkToken, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.WordPieceEncode.encode(" +
        s"$a, $setRef, $maxPlainLen, $maxContLen, $unkRef, $maxInputChars);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceEncode {

  def apply(c: Column, vocab: Seq[String], unkToken: String,
            maxInputChars: Int): Column =
    GraftColumnBridge.column(
      WordPieceEncode(GraftColumnBridge.expression(c), vocab, unkToken,
        maxInputChars))

  /** Shared eval/codegen core: greedy-segment every word of `words` and
    * flatten the pieces in order. A null ELEMENT encodes as zero pieces
    * (the [[BpeApply]] convention — the tokenizer never emits null
    * tokens; containsNull on the input type is tolerated). */
  def encode(words: ArrayData, vocabSet: java.util.HashSet[String],
             maxPlainLen: Int, maxContLen: Int, unkToken: String,
             maxInputChars: Int): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.numElements()) {
      val u = words.getUTF8String(i)
      if (u != null) encodeWord(u.toString, vocabSet, maxPlainLen,
        maxContLen, unkToken, maxInputChars, out)
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(w: String, vocab: java.util.HashSet[String],
                         maxPlainLen: Int, maxContLen: Int, unk: String,
                         maxChars: Int,
                         out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val n = w.length
    if (n == 0) return
    if (n > maxChars) { out += UTF8String.fromString(unk); return }
    // buffer per word: the all-or-nothing rule means a mid-word miss
    // discards every piece matched so far
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var bad = false
    while (start < n && !bad) {
      val lMax = {
        val rem = n - start
        val cap = if (start == 0) maxPlainLen else maxContLen
        if (cap < rem) cap else rem
      }
      var L = lMax
      var foundLen = 0
      var found: String = null
      while (L >= 1 && found == null) {
        val cand =
          if (start == 0) w.substring(0, L)
          else "##" + w.substring(start, start + L)
        if (vocab.contains(cand)) { found = cand; foundLen = L }
        L -= 1
      }
      if (found == null) bad = true
      else { buf += found; start += foundLen }
    }
    if (bad) out += UTF8String.fromString(unk)
    else buf.foreach(p => out += UTF8String.fromString(p))
  }
}
