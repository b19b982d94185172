package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data-capture between two extracts of the same
  * table (reference workflow: nightly full extracts, "what changed since
  * yesterday"). One full-outer join keyed on the primary key; each side's
  * presence + a null-safe column comparison classifies the row:
  *
  *  - `added`:   key only in `after`
  *  - `removed`: key only in `before`
  *  - `changed`: key in both, any compared column differs (null-safe:
  *               NULL -> value and value -> NULL both count as a change)
  *
  * Unchanged rows are NOT emitted — the output is delta-sized, which is
  * the point at 100 TB: the join shuffles both snapshots once on the key
  * (co-partitioned if both sides are bucketed on the pk, zero-exchange via
  * `operators.Bucketing`), but only the delta materializes. Anti-entropy
  * first: when `Checksum.tableChecksum` matches there is no delta and the
  * diff can be skipped entirely.
  */
object Diff {

  /** SCHEMA drift between two extracts — the sync tool's canonical
    * failure mode is an UPSTREAM schema change (the reference
    * re-introspects the source schema every run for exactly this
    * reason; `Merge.upsertEvolving` handles the one safe evolution, and
    * this report is how the unsafe ones surface as a diff instead of a
    * stack trace). Pure METADATA work — schemas compare on the driver,
    * no data scan at any size. One row per changed column:
    * (column_name, change ∈ added|removed|retyped|renullabled,
    * type_before, type_after), absent side rendered `-`; unchanged
    * columns are not emitted (delta-sized, like [[snapshotDiff]]).
    * Types compare on Catalyst's `simpleString` (decimal precision
    * changes count — an implicit cast can truncate). NULLABILITY drift
    * is its own change class: a column whose type is unchanged but
    * whose nullability flipped reports `renullabled` with the flipped
    * side rendered `<type> not null` — required→nullable is the
    * classic upstream change that breaks NOT NULL destinations, and a
    * type-string-only diff would hide it entirely. When the type
    * ITSELF changed, the row reports `retyped` on the plain type
    * strings (the retype dominates; nullability of a different type is
    * not separately meaningful). */
  def schemaDiff(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.schema.map(f => f.name -> (f.dataType.simpleString, f.nullable))
    val a = after.schema.map(f => f.name -> (f.dataType.simpleString, f.nullable))
    // a frame with DUPLICATE column names (legal post-join) would make
    // toMap keep an arbitrary occurrence and the report silently wrong —
    // reject rather than misreport
    for ((side, cols) <- Seq("before" -> b, "after" -> a)) {
      val dups = cols.map(_._1).groupBy(identity).collect { case (n, o) if o.size > 1 => n }
      require(dups.isEmpty,
        s"schemaDiff: $side has duplicate column names ${dups.mkString(", ")} " +
          "— disambiguate (alias) upstream, a name-keyed diff cannot compare them")
    }
    val bm = b.toMap
    val am = a.toMap
    def render(t: String, nullable: Boolean): String =
      if (nullable) t else s"$t not null"
    val rows =
      a.collect { case (n, (t, _)) if !bm.contains(n) => (n, "added", "-", t) } ++
      b.collect { case (n, (t, _)) if !am.contains(n) => (n, "removed", t, "-") } ++
      b.collect { case (n, (t, _)) if am.get(n).exists(_._1 != t) =>
        (n, "retyped", t, am(n)._1) } ++
      b.collect { case (n, (t, nb)) if am.get(n).exists { case (ta, na) =>
          ta == t && na != nb } =>
        (n, "renullabled", render(t, nb), render(t, am(n)._2)) }
    import before.sparkSession.implicits._
    rows.sortBy(_._1).toSeq
      .toDF("column_name", "change", "type_before", "type_after")
  }

  def snapshotDiff(before: DataFrame, after: DataFrame,
                   pks: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(pks.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    val b = before.select((pks ++ compareCols).map(col): _*)
      .withColumn("__in_b", lit(true))
    val a = after.select((pks ++ compareCols).map(c => col(c).as(s"__a_$c")): _*)
      .withColumn("__in_a", lit(true))
    val joinCond = pks.map(k => col(k) === col(s"__a_$k")).reduce(_ && _)
    val differs = compareCols
      .map(c => !(col(c) <=> col(s"__a_$c")))
      .reduce(_ || _)
    b.join(a, joinCond, "full_outer")
      .withColumn("change_type",
        when(col("__in_b").isNull, lit("added"))
          .when(col("__in_a").isNull, lit("removed"))
          .when(differs, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(pks.map(k => coalesce(col(k), col(s"__a_$k")).as(k)) :+ col("change_type"): _*)
  }
}
