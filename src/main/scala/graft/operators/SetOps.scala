package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** O15/O16 — set difference / intersection / ordered listing (reference:
  * db-sync-gcp/gcs_sync.py:36-62 — `files_to_copy = source − dest`,
  * `existing = source ∩ dest`, then `sorted(files_to_copy)`).
  *
  * The reference holds both buckets' name sets in Python memory; here they are
  * DataFrames and the set algebra is anti/semi joins, which Spark executes as
  * broadcast or shuffled hash joins — at 100 TB of listings both sides stream
  * through a hash join keyed on the name, nothing is driver-resident.
  * Existence-only comparison is intentional parity: the reference's README
  * claims MD5 but never reads a hash (SURVEY §2.4-2).
  */
object SetOps {

  /** A − B on key columns (EXCEPT semantics: result is distinct).
    * `usingColumns` join form keeps self-join lineage unambiguous. */
  def difference(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.join(b, keys, "left_anti").dropDuplicates(keys)

  /** A ∩ B on key columns (INTERSECT semantics: distinct). */
  def intersection(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.join(b, keys, "left_semi").dropDuplicates(keys)

  /** Ordered listing (gcs_sync.py:50 — `sorted(files_to_copy)`). */
  def ordered(df: DataFrame, keys: Seq[String]): DataFrame =
    df.orderBy(keys.map(col): _*)
}
