package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The Gopher document-quality rule bundle (Rae et al. 2021, table A1) —
  * the canonical heuristic filter battery every LLM ingest pipeline runs
  * before model-based scoring: word-count bounds, mean-word-length
  * bounds, symbol-to-word ratio, bullet-line and ellipsis-line shares,
  * alphabetic-word share, and a must-have stopword floor. [[TextAnalysis
  * .qualityOk]] is the two-signal toy; THIS is the full battery, one rule
  * per output column so curation can inspect *why* a document fails (the
  * standard practice — rules are tuned per corpus by inspecting per-rule
  * kill rates, impossible with a single fused boolean).
  *
  * EVERY quantity is integer (counts, milli-scaled means, cross-
  * multiplied ratio tests — never a float division), so the whole battery
  * is bit-exact cross-engine and graded against a full DuckDB oracle
  * running the same counts (q171). One narrow codegen'd projection: at
  * 100 TB the corpus is scanned once, nothing shuffles, and the rules
  * cost a handful of regex passes per row. Words here are WHITESPACE
  * runs (`\S+`, the Gopher definition) — deliberately not
  * [[TextAnalysis.tokens]]'s [a-z0-9]+, because rules 3 and 6 measure
  * exactly the non-alphanumeric noise that tokenizer class strips. */
object Gopher {

  /** The Gopher "must-have" stopwords: a document failing to contain at
    * least [[MinStopwords]] DISTINCT members is likely non-prose. */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanWordLenMilli = 3000L
  val MaxMeanWordLenMilli = 10000L
  val MinStopwords = 2L

  /** Compression-ratio quality signal in milli (floor(1000 · deflated /
    * utf8_len)): the Gopher-family repetition heuristic — boilerplate
    * compresses far below prose, noise barely compresses at all. Backed
    * by [[graft.functions.DeflateSize]] (round-trip-verified deflate at
    * a pinned level; -1 on failure propagates as a negative ratio the
    * caller must treat as fail-closed). NULL for empty/NULL text — no
    * bytes, no signal. Narrow, one pass. */
  def compressionRatioMilli(c: Column): Column =
    when(octet_length(c) > 0,
      floor(graft.functions.DeflateSize(c) * 1000.0 / octet_length(c))
        .cast(LongType))

  /** Per-document rule columns: counts first (auditable), then one 0/1
    * flag per rule, then the fused `keep`. Appended to `idCol`. `extra`
    * columns (e.g. [[compressionRatioMilli]]) ride in the SAME narrow
    * projection — never join two scans for per-row signals. */
  def quality(df: DataFrame, idCol: String, textCol: String,
              extra: (String, Column)*): DataFrame = {
    // an extra named after a battery column would silently clobber it
    // (withColumn("keep", ...) replaces, duplicate names make downstream
    // col() ambiguous) — same silent-clobber guard as Expectations.rowChecks
    val fixed = Set(idCol, "n_words", "mean_wlen_milli", "n_sym", "n_lines",
      "n_bullet", "n_ellipsis", "n_alpha", "n_stop", "r_words", "r_wlen",
      "r_sym", "r_bullet", "r_ellipsis", "r_alpha", "r_stop", "keep")
    require(extra.map(_._1).distinct.length == extra.length,
      "Gopher.quality: duplicate extra column names")
    extra.foreach { case (n, _) =>
      require(!fixed.contains(n),
        s"Gopher.quality: extra column '$n' collides with a battery column")
    }
    val c = col(textCol)
    val words = regexp_extract_all(c, lit("\\S+"), lit(0))
    val nWords = size(words).cast(LongType)
    val sumWlen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    // milli-scaled mean: floor(sum·1000 / n). The one division — both
    // operands are exact small integers in double range and BOTH engines
    // run the identical IEEE divide-then-floor, so the result is still
    // bit-deterministic cross-engine (values < 2^53 throughout)
    val meanMilli = when(nWords > 0,
      floor((sumWlen * 1000L) / nWords).cast(LongType))
      .otherwise(lit(0L))
    val nSym = size(regexp_extract_all(c, lit("#|\\.\\.\\.|…"), lit(0)))
      .cast(LongType)
    val lines = split(c, "\n")
    val nLines = size(lines).cast(LongType)
    val nBullet = size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("•"))).cast(LongType)
    val nEllipsis = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast(LongType)
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast(LongType)
    // one alternation pass + distinct count instead of one \b<w>\b rlike
    // scan PER stopword (8 full-text regex passes per row on the ingest
    // hot path) — value-identical: a stopword is counted iff it appears
    // word-bounded, once. Stopwords are plain letters, so no escaping.
    // NULL text is pinned by an explicit isNull arm, NOT coalesce: under
    // Spark's default legacy sizeOfNull, size(NULL) is -1 (not NULL), so
    // a coalesce never fires and n_stop would drift to -1 where the old
    // per-stopword when() sum emitted 0.
    val nStop = when(c.isNull, lit(0L)).otherwise(
      size(array_distinct(regexp_extract_all(lower(c),
        lit("\\b(?:" + Stopwords.mkString("|") + ")\\b"), lit(0))))
        .cast(LongType))
    def flag(b: Column): Column = when(b, 1L).otherwise(0L)
    val r1 = flag(nWords >= MinWords && nWords <= MaxWords)
    val r2 = flag(meanMilli >= MinMeanWordLenMilli && meanMilli <= MaxMeanWordLenMilli)
    // ratio tests as integer cross-multiplications: sym/words <= 0.1,
    // bullet/lines <= 0.9, ellipsis/lines <= 0.3, alpha/words >= 0.8
    val r3 = flag(nSym * 10L <= nWords)
    val r4 = flag(nBullet * 10L <= nLines * 9L)
    val r5 = flag(nEllipsis * 10L <= nLines * 3L)
    val r6 = flag(nAlpha * 10L >= nWords * 8L)
    val r7 = flag(nStop >= MinStopwords)
    df.select(Seq(col(idCol),
      nWords.as("n_words"), meanMilli.as("mean_wlen_milli"),
      nSym.as("n_sym"), nLines.as("n_lines"), nBullet.as("n_bullet"),
      nEllipsis.as("n_ellipsis"), nAlpha.as("n_alpha"),
      nStop.cast(LongType).as("n_stop"),
      r1.as("r_words"), r2.as("r_wlen"), r3.as("r_sym"), r4.as("r_bullet"),
      r5.as("r_ellipsis"), r6.as("r_alpha"), r7.as("r_stop")) ++
      extra.map { case (n, e) => e.as(n) }: _*)
      .withColumn("keep",
        when(col("r_words") + col("r_wlen") + col("r_sym") + col("r_bullet")
          + col("r_ellipsis") + col("r_alpha") + col("r_stop") === 7L, 1L)
          .otherwise(0L))
  }
}
