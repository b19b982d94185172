package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The reference's two-stage JSONB quote-repair
  * (db-sync-local/sync_utils.py:97-126), replicated byte-for-byte:
  *
  * Stage 1: if the string looks like `'{...}'`, strip the outer single quotes;
  * then replace doubled single quotes `''` with `"`; verify it parses as JSON.
  * Stage 2 (on any stage-1 failure): operating on the *stage-1-transformed*
  * string (the reference mutates `value` in place before the try fails),
  * replace `'` with `"`, then `""` with `'`; verify; unparseable -> NULL
  * (lossy by design — SURVEY §2.4-5).
  *
  * Implemented as a Scala UDF over a deterministic pure function. The pure
  * function is unit-tested against the reference's semantics matrix; the UDF
  * is only on dirty-JSON repair paths, never in analytical hot loops, so UDF
  * (vs codegen Expression) overhead is acceptable — it runs once per ingested
  * record, embarrassingly parallel across partitions.
  */
object JsonRepair {

  // Jackson ships with Spark; thread-safe for reads.
  @transient private lazy val mapper = new ObjectMapper()

  private def parses(s: String): Boolean =
    try { mapper.readTree(s); true }
    catch { case _: Exception => false }

  /** Pure repair: Some(repaired) or None (reference appends NULL). */
  def repair(value: String): Option[String] = {
    if (value == null) return None
    // Stage 1 (sync_utils.py:101-108)
    var v = value
    if (v.startsWith("'{") && v.endsWith("}'")) v = v.substring(1, v.length - 1)
    v = v.replace("''", "\"")
    if (parses(v)) Some(v)
    else {
      // Stage 2 (sync_utils.py:117-121) — on the mutated value, like the reference
      val fixed = v.replace("'", "\"").replace("\"\"", "'")
      if (parses(fixed)) Some(fixed) else None
    }
  }

  private val repairUdf = udf((s: String) => repair(s).orNull)

  /** Column form: NULL in -> NULL out, unparseable -> NULL. */
  def apply(c: Column): Column = repairUdf(c)
}
