package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** O2/O4 — projection with the reference's ignore-columns rule.
  *
  * Reference: explicit column lists (db-sync-local/sync_utils.py:13-15, used at
  * :43,:59) built from introspected schema where `ignore_columns` are dropped
  * *only when the column is nullable* (sync_utils.py:215-217 — SURVEY §2.4-6).
  *
  * Scale: `select` of plain attributes is pruned into the scan by Catalyst
  * (`ReadSchema` shows only the kept columns), so a 2-column projection of a
  * 100-column 100 TB table reads 2 columns' worth of bytes.
  */
object Projection {

  /** Fields that survive the ignore-if-nullable rule. */
  def keptFields(schema: StructType, ignore: Set[String]): Seq[String] =
    schema.fields.toSeq.filterNot(f => ignore.contains(f.name) && f.nullable).map(_.name)

  /** Drop ignored columns, but keep them when non-nullable (reference quirk). */
  def ignoring(df: DataFrame, ignore: Set[String]): DataFrame = {
    val keep = keptFields(df.schema, ignore)
    df.select(keep.map(col): _*)
  }

  /** O4 — plain explicit projection. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)
}
