package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII-style scrubbing for training corpora: regex redaction of sensitive
  * spans (emails, long digit runs — the phone/SSN/account-number shape)
  * with per-row redaction counts for audit reports.
  *
  * Pure `regexp_replace`/`regexp_extract_all` column expressions — one
  * narrow codegen'd pass, no shuffle, composes into any scan. Patterns are
  * restricted to the regex subset with identical semantics in Java
  * (Spark) and RE2 (DuckDB/Go tooling): character classes, bounded
  * repetition, alternation — no backrefs, no lookaround — so the scrub is
  * bit-reproducible across the engines a corpus pipeline actually spans.
  *
  * Real pipelines chain more patterns (IP addresses, street addresses via
  * NER, credit cards with Luhn checks); the operator shape — ordered
  * pattern list, longest/most-specific first so an email's digits are
  * claimed by the email mask, not the digit mask — is what this module
  * fixes. Counts are computed on the ORIGINAL text per pattern, so a
  * span matching two patterns is reported under each (the masks
  * themselves never double-apply because replacement is sequential).
  */
object Scrub {

  /** Email-ish spans. Same match set in Java regex and RE2. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Digit runs of at least `minLen` — the numeric-identifier shape.
    * Production uses >= 6 (phones, SSNs); tests on short synthetic text
    * use smaller. */
  def digitRunRe(minLen: Int): String = s"[0-9]{$minLen,}"

  /** Apply masks in order: each (pattern, replacement) globally replaced. */
  def redact(c: Column, masks: Seq[(String, String)]): Column =
    masks.foldLeft(c) { case (acc, (re, repl)) => regexp_replace(acc, re, repl) }

  /** Matches of `pattern` in the original text (audit count). */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast(LongType)

  /** Scrub report over a text column: the redacted text plus one count
    * column per named pattern ((name, regex, replacement) triples; masks
    * apply in `patterns` order). */
  def scrubbed(df: DataFrame, textCol: String,
               patterns: Seq[(String, String, String)]): DataFrame = {
    val names = patterns.map(_._1)
    require(names.distinct == names,
      s"duplicate pattern names would silently drop audit counts: $names")
    require(!names.contains("scrubbed") && !names.contains(textCol),
      s"pattern names collide with an output column: $names")
    df.withColumns(
      Map("scrubbed" ->
        redact(col(textCol), patterns.map { case (_, re, repl) => (re, repl) })) ++
        patterns.map { case (name, re, _) => name -> matchCount(col(textCol), re) })
  }

  /** WITHIN-document line dedup — keep the FIRST occurrence of every
    * line inside each document, preserving order: the in-doc half of
    * line-level cleanup (boilerplate repeats its nav/footer lines inside
    * one page long before it repeats them across the corpus — that
    * cross-doc half is the df-gated [[graft.dedup.Dedup.lineDedup]]).
    * A pure per-row array pass — split, an indexed higher-order filter
    * (keep line i iff it does not appear before position i), rejoin —
    * so it fuses into the scan with NO shuffle and no per-doc window;
    * the quadratic prefix probe is lines-per-doc-bounded JVM work, the
    * right trade against shuffling (doc_id, line) pairs corpus-wide.
    * Output adds `clean` (the deduped text), `n_lines`, `n_removed`. */
  def dedupLinesWithin(df: DataFrame, textCol: String): DataFrame = {
    val clash = df.columns.toSet
      .intersect(Set("__ls", "__kept", "clean", "n_lines", "n_removed"))
    require(clash.isEmpty,
      s"dedupLinesWithin: input columns collide with outputs/temporaries: " +
        s"${clash.mkString(", ")} (the scrubbed() collision contract)")
    df
      .withColumn("__ls", split(col(textCol), "\n"))
      .withColumn("__kept",
        expr("filter(__ls, (x, i) -> array_position(slice(__ls, 1, i), x) = 0)"))
      .withColumn("clean", array_join(col("__kept"), "\n"))
      .withColumn("n_lines", size(col("__ls")).cast(LongType))
      .withColumn("n_removed",
        (size(col("__ls")) - size(col("__kept"))).cast(LongType))
      .drop("__ls", "__kept")
  }
}
