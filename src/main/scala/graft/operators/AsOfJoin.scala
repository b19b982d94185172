package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join — "the most recent fact at or before this time" — an operator
  * Spark has no built-in for (DuckDB: ASOF JOIN; Pandas: merge_asof).
  *
  * Composed from existing ops per the preference order (no custom plan node
  * needed): the naive formulation is a range join — every (left, right) pair
  * within a key compared before an argmax, O(|L|·|R|) per key. Here both
  * sides are UNIONED, tagged, and sorted once per key; each right payload
  * column propagates forward with last(_, ignoreNulls) over
  * rows-unbounded-preceding. One shuffle on the key (the same cost as any
  * keyed window), linear in |L|+|R|, skew-bounded by the hottest key like
  * every keyed operator — the plan that survives 100 TB of events.
  */
object AsOfJoin {

  /** Backward inclusive as-of join: each left row gains the payload of the
    * LATEST right row with `rightTime` <= `leftTime` in the same key group;
    * left rows with no prior right row keep NULL payloads (left-outer
    * semantics). A right row exactly simultaneous with a left row matches
    * (inclusive — right rows sort before left rows at equal times).
    *
    * Payload = every right column except `keys` (including `rightTime`
    * itself, so callers see WHEN the matched fact happened). Payload names
    * must not clash with left columns — rename before joining. For
    * deterministic payloads the right side must be unique per
    * (keys, rightTime). The matched right row is taken ATOMICALLY: all
    * payload columns travel as one struct through a single
    * last(ignoreNulls) window, so a NULL payload VALUE in the latest
    * matched row stays NULL (whole-row semantics, matching DuckDB ASOF and
    * pandas merge_asof) rather than back-filling from an older right row.
    * Forward as-of = backward over negated time columns. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    require(left.columns.contains(leftTime), s"left is missing time column $leftTime")
    require(right.columns.contains(rightTime), s"right is missing time column $rightTime")
    val leftOther = left.schema.fields.toSeq.filterNot(f => keys.contains(f.name))
    val payload = right.schema.fields.toSeq.filterNot(f => keys.contains(f.name))
    val clash = payload.map(_.name).toSet intersect leftOther.map(_.name).toSet
    require(clash.isEmpty, s"payload columns clash with left columns: $clash — rename before joining")
    // the whole right row rides as ONE struct: left rows carry a NULL
    // struct, right rows a non-null one (even if every field inside is
    // NULL), so last(ignoreNulls) skips exactly the left rows and never
    // mixes payload columns from different right rows
    val payloadStruct = struct(payload.map(f => col(f.name)): _*)
    val nullPayload = lit(null).cast(StructType(payload.map(f =>
      StructField(f.name, f.dataType, nullable = true))))
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag"), nullPayload.as("__p")) ++
        leftOther.map(f => col(f.name)): _*)
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag"), payloadStruct.as("__p")) ++
        leftOther.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(keys.map(col) ++
        Seq(col("__tag"), last(col("__p"), ignoreNulls = true).over(w).as("__p")) ++
        leftOther.map(f => col(f.name)): _*)
      .filter(col("__tag") === 1)
      .select(keys.map(col) ++
        leftOther.map(f => col(f.name)) ++
        payload.map(f => col("__p").getField(f.name).as(f.name)): _*)
  }
}
