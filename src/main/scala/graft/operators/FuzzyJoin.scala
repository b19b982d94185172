package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 fuzzy string matching at scale — the record-linkage /
  * spell-variant step (near-identical codes, misspelled names, OCR slips)
  * that exact joins and token-set dedup both miss.
  *
  * The naive formulation is the O(n²) cross join with a levenshtein
  * predicate — a non-equi join no engine can hash. The scale path is the
  * deletion-neighborhood (SymSpell) blocking scheme: every string emits its
  * single-character-deletion variants plus itself, and two strings within
  * edit distance 1 ALWAYS share a variant —
  *   equal            -> share the string itself,
  *   substitution     -> deleting the differing position from each side
  *                       yields the same string,
  *   insert/delete    -> the shorter string IS a deletion variant of the
  *                       longer.
  * So an equi-join on hashed variants is a COMPLETE candidate generator
  * (no recall loss, unlike LSH), and it can over-generate only mildly
  * (same-length strings sharing a variant via deletions at different
  * positions are distance 2) — a codegen'd `levenshtein` verify on the
  * candidates removes those. Cost: ~(len+1) index rows per string and
  * collisions-not-n² join work, the same candidates-then-verify shape as
  * the MinHash/SimHash paths.
  */
object FuzzyJoin {

  /** The named string column plus its single-character-deletion variants,
    * deduplicated (deleting either of a doubled letter yields the same
    * variant). Callers guarantee length >= 1: `sequence(1, 0)` on an empty
    * string would DESCEND ([1, 0] — Spark infers step -1), not stay empty. */
  private def deletionNeighborhood(name: String): Column = array_distinct(concat(
    array(col(name)),
    expr(s"transform(sequence(1, length($name)), i -> " +
      s"concat(substring($name, 1, i - 1), " +
      s"substring($name, i + 1, length($name))))")))

  /** All unordered pairs (w_a < w_b) of distinct values of `strCol` with
    * levenshtein distance <= 1. Null and empty strings are excluded (the
    * empty string is within distance 1 of every single character — a
    * degenerate hub that is never the record-linkage intent). Variant
    * buckets are the skew unit: very short strings produce high-collision
    * variants, so corpora of length-1/2 codes approach all-pairs within
    * that length class — inherent to the scheme, not a plan defect. */
  def neighborPairs(df: DataFrame, strCol: String): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val words = df.select(col(strCol).as("w"))
      .filter(col("w").isNotNull && length(col("w")) > 0)
      .distinct()
      // explicit count for the same AQE row-explosion reason the LSH band
      // joins document: the variant explode is byte-small but row-heavy
      .repartition(n, col("w"))
    val keyed = words
      .select(col("w"), explode(deletionNeighborhood("w")).as("__v"))
      .select(col("w"), xxhash64(col("__v")).as("__vk"))
    val a = keyed.select(col("w").as("w_a"), col("__vk"))
    val b = keyed.select(col("w").as("w_b"), col("__vk"))
    a.join(b, Seq("__vk"))
      .filter(col("w_a") < col("w_b"))
      .select("w_a", "w_b")
      // dedup BEFORE the verify: pairs sharing several variants would run
      // the levenshtein once per collision otherwise
      .distinct()
      .filter(levenshtein(col("w_a"), col("w_b")) <= 1)
  }
}
