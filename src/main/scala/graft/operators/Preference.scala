package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair mining — the RLHF/DPO data-prep stage downstream of
  * the SFT family ([[graft.text.Chat]]): rollout tables arrive as
  * (prompt, completion, score) rows — N sampled completions per prompt,
  * each scored by a reward model or judge — and the preference trainer
  * consumes (chosen, rejected) PAIRS. The standard mining rule is
  * best-vs-worst: per prompt, chosen = the highest-scored completion,
  * rejected = the lowest-scored, kept only when the score gap clears a
  * margin (a near-tie pair teaches noise — DPO's loss gradient scales
  * with the true preference strength, so low-margin pairs are worse
  * than fewer pairs).
  *
  * Scale shape: ONE aggregation, shuffled on the prompt key only —
  * `max_by`/`min_by` with struct ordering keys, which combine
  * map-side (each partition ships one candidate pair per prompt, not
  * its rollouts), no window, no self-join; output cardinality is
  * |prompts|, never |rollouts|². At 100 TB of rollouts this is a
  * single partial-agg shuffle exactly like a `groupBy().max()`.
  * Tie-breaks are deterministic — equal scores resolve to the LOWEST
  * completion id on both sides (re-runs and re-partitions mine the
  * identical pair set; a nondeterministic argmax would churn the
  * training set between pipeline runs).
  *
  * The per-prompt (best, worst, n) candidate row is a SEMIGROUP under
  * [[mergeCandidates]] — best/worst each pick the winner of two
  * candidates by the same deterministic key, counts add — which is
  * what makes the CONTINUOUSLY-MAINTAINED form
  * ([[graft.streaming.IncrementalStream.preferenceIngest]]) exact:
  * however rollouts are micro-batched, folding batch candidates into
  * the state is merge-order-invariant and the derived pairs equal the
  * batch miner over everything that has arrived. */
object Preference {

  import org.apache.spark.sql.types._

  /** Both sides are MINIMA under a total order, so the id needs no
    * arithmetic (ids are often strings — UUID rollout ids must
    * tie-break identically on both sides, which a negated-id max key
    * would silently break by casting to NULL): the chosen side
    * minimizes (−score, id) — highest score, ties to the LOWEST id —
    * and the rejected side minimizes (score, id). Only the SCORE is
    * negated, WIDENED first for integral types: `-MinValue` overflows
    * its own type (an ANSI-mode crash, a silently inverted ranking
    * otherwise), and DecimalType(20,0) holds every ±2⁶³ value exactly
    * with the same ordering. */
  private def bestKey(dt: DataType)(score: Column, id: Column): Column = {
    val widened = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        score.cast(DecimalType(20, 0))
      case _ => score
    }
    struct(negate(widened).as("s"), id.as("i"))
  }

  private def worstKey(score: Column, id: Column): Column =
    struct(score.as("s"), id.as("i"))

  /** Scores carry arithmetic (negation here, centering in
    * [[groupAdvantages]]) — a string score column would silently cast
    * instead of failing, so reject it at the API. Resolution follows
    * the session's resolver (case-insensitive by default — a
    * case-sensitive schema lookup would reject names `col()` accepts). */
  private def scoreType(df: DataFrame, scoreCol: String,
                        op: String): DataType = {
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val dt = df.schema.fields.find(f => resolver(f.name, scoreCol))
      .map(_.dataType)
      .getOrElse(throw new IllegalArgumentException(
        s"Preference.$op: score column '$scoreCol' not found in ${df.schema.fieldNames.mkString(", ")}"))
    require(dt.isInstanceOf[NumericType],
      s"Preference.$op: score column '$scoreCol' must be numeric, got ${dt.simpleString}")
    dt
  }

  /** Per-prompt candidate state:
    * `(promptCol, ch struct<id,text,score>, rj struct<id,text,score>,
    * n_rollouts)` — the mergeable form [[pairs]] gates and the
    * maintained view stores. NULL-score rollouts are dropped first (an
    * unscored completion is a judge failure, not evidence);
    * `n_rollouts` counts SCORED rollouts. */
  def candidates(rollouts: DataFrame, promptCol: String, idCol: String,
                 textCol: String, scoreCol: String): DataFrame = {
    val dt = scoreType(rollouts, scoreCol, "candidates")
    val cand = struct(col(idCol).as("id"), col(textCol).as("text"),
      col(scoreCol).as("score"))
    rollouts.where(col(scoreCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(
        min_by(cand, bestKey(dt)(col(scoreCol), col(idCol))).as("ch"),
        min_by(cand, worstKey(col(scoreCol), col(idCol))).as("rj"),
        count(lit(1)).as("n_rollouts"))
  }

  /** The semigroup merge of two candidate tables keyed by `promptCol`
    * (full outer — a prompt may exist on either side): best beats best
    * by the chosen key, worst beats worst by the rejected key, counts
    * add. Associative and commutative (each side is a max/min under a
    * total deterministic order), so folds over any batch split agree. */
  def mergeCandidates(prev: DataFrame, part: DataFrame,
                      promptCol: String): DataFrame = {
    val p = part.withColumnRenamed("ch", "__ch").withColumnRenamed("rj", "__rj")
      .withColumnRenamed("n_rollouts", "__n")
      .withColumnRenamed(promptCol, "__k")
    // the stored candidate's score field carries the rollouts' score
    // type — the SAME widened best key as [[candidates]] keeps the
    // merge order-equivalent to the partial's min_by
    val dt = prev.schema("ch").dataType.asInstanceOf[StructType]("score").dataType
    // both sides pick the key-MINIMAL candidate (the [[bestKey]]/
    // [[worstKey]] convention) — one comparator, two keys
    def minBy(key: (Column, Column) => Column)(a: Column, b: Column): Column =
      when(a.isNull, b).when(b.isNull, a)
        .when(key(a.getField("score"), a.getField("id")) <=
          key(b.getField("score"), b.getField("id")), a)
        .otherwise(b)
    prev.join(p, prev(promptCol) <=> p("__k"), "full_outer")
      .select(
        coalesce(prev(promptCol), p("__k")).as(promptCol),
        minBy(bestKey(dt))(prev("ch"), p("__ch")).as("ch"),
        minBy(worstKey)(prev("rj"), p("__rj")).as("rj"),
        (coalesce(prev("n_rollouts"), lit(0L)) + coalesce(p("__n"), lit(0L)))
          .as("n_rollouts"))
  }

  /** The margin gate over a candidate table ([[candidates]] output or
    * the maintained state): one row per prompt whose margin (chosen −
    * rejected score) is strictly positive AND ≥ `minMargin`; a prompt
    * whose rollouts all tie yields no pair (no preference signal
    * exists). `margin` is emitted as DOUBLE, computed through the
    * decimal widening for integral scores — a raw typed subtraction
    * overflows under ANSI when the span touches a MinValue sentinel —
    * so it is exact below 2⁵³ and merely rounded (never wrong-signed,
    * never a crash) beyond. */
  def pairsFromCandidates(cands: DataFrame, promptCol: String,
                          minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0, s"Preference: minMargin must be >= 0, got $minMargin")
    val dt = cands.schema("ch").dataType.asInstanceOf[StructType]("score").dataType
    def widen(c: Column): Column = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        c.cast(DecimalType(20, 0))
      case _ => c
    }
    cands.select(col(promptCol),
      col("ch.id").as("chosen_id"), col("ch.text").as("chosen"),
      col("ch.score").as("chosen_score"),
      col("rj.id").as("rejected_id"), col("rj.text").as("rejected"),
      col("rj.score").as("rejected_score"),
      (widen(col("ch.score")) - widen(col("rj.score")))
        .cast(DoubleType).as("margin"),
      col("n_rollouts"))
      .where(col("margin") > 0 && col("margin") >= minMargin)
  }

  /** Group-relative advantage prep (the GRPO shape): per ROLLOUT, the
    * statistics a group-baseline RL trainer consumes — each completion's
    * reward centered against its own prompt's group, which is the
    * critic-free baseline (PPO's learned value network replaced by the
    * group mean of the N samples from the same prompt). Emitted
    * INTEGER-EXACT as numerators over the group size, so integral
    * reward scales grade losslessly across engines and the consumer
    * derives floats at the precision it wants:
    *
    *  - `adv_num` = n·score − Σscore; advantage = adv_num / n
    *  - `var_num` = n·Σscore² − (Σscore)²; variance = var_num / n²
    *  - the z-score normalization GRPO applies is then exactly
    *    z = adv_num / √var_num (the n's cancel) — an all-tie group has
    *    var_num 0 and contributes no gradient (the trainer's guard).
    *
    * Scale shape: ONE prompt-keyed exchange feeding one Window node
    * (count/sum/sum-of-squares over the same partition share the
    * exchange) — per-rollout output makes a window the right tool
    * where [[pairs]]'s per-prompt output made an aggregation right; no
    * join, no second shuffle. NULL-score rollouts drop first, matching
    * [[candidates]]. */
  def groupAdvantages(rollouts: DataFrame, promptCol: String, idCol: String,
                      scoreCol: String): DataFrame = {
    scoreType(rollouts, scoreCol, "groupAdvantages")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(promptCol))
    rollouts.where(col(scoreCol).isNotNull)
      .select(col(promptCol), col(idCol), col(scoreCol),
        count(lit(1)).over(w).as("n_rollouts"),
        sum(col(scoreCol)).over(w).as("__sum"),
        sum(col(scoreCol) * col(scoreCol)).over(w).as("__sumsq"))
      .select(col(promptCol), col(idCol), col(scoreCol),
        col("n_rollouts"),
        (col(scoreCol) * col("n_rollouts") - col("__sum")).as("adv_num"),
        (col("n_rollouts") * col("__sumsq") - col("__sum") * col("__sum"))
          .as("var_num"))
  }

  /** Best-vs-worst pairs per prompt, in one pass. Output:
    * `(promptCol, chosen_id, chosen, chosen_score, rejected_id,
    * rejected, rejected_score, margin, n_rollouts)` — see
    * [[candidates]] and [[pairsFromCandidates]] for the NULL-score and
    * margin semantics. */
  def pairs(rollouts: DataFrame, promptCol: String, idCol: String,
            textCol: String, scoreCol: String,
            minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0, s"Preference.pairs: minMargin must be >= 0, got $minMargin")
    pairsFromCandidates(
      candidates(rollouts, promptCol, idCol, textCol, scoreCol),
      promptCol, minMargin)
  }
}
