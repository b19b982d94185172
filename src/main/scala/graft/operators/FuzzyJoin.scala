package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-edit-distance fuzzy string matching at scale — the
  * record-linkage / spell-variant step (near-identical codes, misspelled
  * names, OCR slips) that exact joins and token-set dedup both miss.
  *
  * The naive formulation is the O(n²) cross join with a levenshtein
  * predicate — a non-equi join no engine can hash. The scale path is the
  * deletion-neighborhood (SymSpell) blocking scheme: every string emits
  * its character-deletion variants (up to `maxDist` deletions) plus
  * itself, and two strings within edit distance d share a depth-d
  * variant — at d = 1:
  *   equal            -> share the string itself,
  *   substitution     -> deleting the differing position from each side
  *                       yields the same string,
  *   insert/delete    -> the shorter string IS a deletion variant of the
  *                       longer,
  * and inductively at d = 2 (each of the two edits is absorbed by one
  * deletion per side — the SymSpell completeness argument for
  * delete-only candidate generation). So an equi-join on hashed variants
  * is a COMPLETE candidate generator (no recall loss, unlike LSH), and
  * over-generation (variant-sharing pairs beyond the distance bound) is
  * removed by a codegen'd `levenshtein` verify on the deduped
  * candidates. Cost: ~(len+1) index rows per string at depth 1,
  * ~(len²/2) at depth 2 — the standard spell-correction trade — and
  * collisions-not-n² join work, the same candidates-then-verify shape
  * as the MinHash/SimHash paths.
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

  /** Depth-2 additions: every string from deleting TWO positions i < j.
    * Guarded to length >= 2 — `sequence(1, 0)` on a shorter string would
    * DESCEND (Spark infers step -1), manufacturing phantom variants.
    * Length-2 strings legitimately emit the EMPTY variant (both chars
    * deleted): a hub bucket shared by every length <= 2 string, which is
    * exactly the distance-2 truth for those lengths — the verify prunes
    * nothing incorrect, the skew note below applies. */
  private def deletionNeighborhood2(name: String): Column = {
    val two = expr(
      s"flatten(transform(sequence(1, length($name) - 1), i -> " +
        s"transform(sequence(i + 1, length($name)), j -> " +
        s"concat(substring($name, 1, i - 1), " +
        s"substring($name, i + 1, j - i - 1), " +
        s"substring($name, j + 1, length($name))))))")
    array_distinct(concat(
      deletionNeighborhood(name),
      when(length(col(name)) >= 2, two).otherwise(array().cast("array<string>"))))
  }

  /** All unordered pairs (w_a < w_b) of distinct values of `strCol` with
    * levenshtein distance <= `maxDist` (1 — the record-linkage default —
    * or 2, the common spell-correction radius). Null and empty strings
    * are excluded (the empty string is within distance 1 of every single
    * character — a degenerate hub that is never the record-linkage
    * intent). Variant buckets are the skew unit: very short strings
    * produce high-collision variants (at depth 2, every length <= 2
    * string shares the empty variant), so corpora of length-1/2 codes
    * approach all-pairs within that length class — inherent to the
    * scheme, not a plan defect. */
  def neighborPairs(df: DataFrame, strCol: String, maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"neighborPairs: maxDist must be 1 or 2, got $maxDist")
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val words = df.select(col(strCol).as("w"))
      .filter(col("w").isNotNull && length(col("w")) > 0)
      .distinct()
      // explicit count for the same AQE row-explosion reason the LSH band
      // joins document: the variant explode is byte-small but row-heavy
      .repartition(n, col("w"))
    val hood =
      if (maxDist == 1) deletionNeighborhood("w") else deletionNeighborhood2("w")
    val keyed = words
      .select(col("w"), explode(hood).as("__v"))
      .select(col("w"), xxhash64(col("__v")).as("__vk"))
    val a = keyed.select(col("w").as("w_a"), col("__vk"))
    val b = keyed.select(col("w").as("w_b"), col("__vk"))
    a.join(b, Seq("__vk"))
      .filter(col("w_a") < col("w_b"))
      .select("w_a", "w_b")
      // dedup BEFORE the verify: pairs sharing several variants would run
      // the levenshtein once per collision otherwise
      .distinct()
      .filter(levenshtein(col("w_a"), col("w_b")) <= maxDist)
  }
}
