package graft.sync

import graft.SparkSpec
import graft.config.{CheckType, TableConfig}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** §5 golden round-trip tests: dest == source after full sync; delta-only
  * after incremental; idempotent second run; id vs timestamp watermark
  * asymmetry end-to-end. */
class SyncJobSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore() =
    new ParquetStore(spark, Files.createTempDirectory("graft_sync").toString)

  private def rows(ids: Long*) = ids.map(i => (i, s"v$i")).toDF("id", "v")

  private val idCfg = TableConfig("t", Some("id"), Some(CheckType.Id), Seq.empty)

  test("full sync into empty destination copies everything") {
    val (src, dst) = (tmpStore(), tmpStore())
    src.write(rows(1, 2, 3), "t")
    val stats = SyncJob.run(src, dst, idCfg, primaryKeys = Seq("id"))
    assert(stats.rowsUpserted === 3)
    assert(dst.read("t").get.select("id").as[Long].collect().sorted === Seq(1L, 2L, 3L))
  }

  test("incremental picks only rows above the destination watermark; idempotent rerun") {
    val (src, dst) = (tmpStore(), tmpStore())
    src.write(rows(1, 2, 3), "t")
    SyncJob.run(src, dst, idCfg, Seq("id"))
    // new + changed rows upstream
    src.write(rows(1, 2, 3, 4, 5), "t")
    val s2 = SyncJob.run(src, dst, idCfg, Seq("id"))
    assert(s2.mode === "incremental id > 3")
    assert(dst.read("t").get.count() === 5)
    // rerun with no new data: no-op (strict >)
    val s3 = SyncJob.run(src, dst, idCfg, Seq("id"))
    assert(s3.mode === "incremental id > 5")
    assert(dst.read("t").get.count() === 5)
  }

  test("upsert semantics: delta wins on conflicting key") {
    val (src, dst) = (tmpStore(), tmpStore())
    dst.write(Seq((1L, "old"), (2L, "old")).toDF("id", "v"), "t")
    src.write(Seq((2L, "new"), (3L, "new")).toDF("id", "v"), "t")
    // full copy (no check column) -> all source rows merge over dest
    SyncJob.run(src, dst, TableConfig("t", None, None, Seq.empty), Seq("id"))
    val out = dst.read("t").get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "old", 2L -> "new", 3L -> "new"))
  }

  test("timestamp watermark: empty destination -> full copy branch") {
    val (src, dst) = (tmpStore(), tmpStore())
    val df = Seq(("2020-01-01 00:00:00", 1L), ("2021-01-01 00:00:00", 2L)).toDF("s", "id")
      .select(to_timestamp($"s").as("ts"), $"id")
    src.write(df, "t")
    dst.write(df.filter(lit(false)), "t") // empty table with schema
    val cfg = TableConfig("t", Some("ts"), Some(CheckType.Timestamp), Seq.empty)
    val stats = SyncJob.run(src, dst, cfg, Seq("id"))
    assert(stats.mode.startsWith("full"))
    assert(dst.read("t").get.count() === 2)
  }

  test("ignore_columns drops nullable columns through the whole pipeline") {
    val (src, dst) = (tmpStore(), tmpStore())
    src.write(Seq((1L, "keep", "drop")).toDF("id", "v", "note"), "t")
    SyncJob.run(src, dst, TableConfig("t", None, None, Seq("note")), Seq("id"))
    assert(dst.read("t").get.columns.toSeq === Seq("id", "v"))
  }

  test("stats ride the write pass: destination is never re-read for counting") {
    val (src, dstInner) = (tmpStore(), tmpStore())
    src.write(rows(1, 2, 3), "t")
    var reads = 0
    val dst = new TableStore {
      override def read(table: String) = { reads += 1; dstInner.read(table) }
      override def write(df: org.apache.spark.sql.DataFrame, table: String) =
        dstInner.write(df, table)
    }
    val stats = SyncJob.run(src, dst, idCfg, Seq("id"))
    assert(stats.rowsUpserted === 3)
    // exactly the pre-write watermark/merge read — no post-write count scan
    assert(reads === 1)
  }

  test("no delete propagation: rows deleted upstream persist in dest (§2.4-1)") {
    val (src, dst) = (tmpStore(), tmpStore())
    src.write(rows(1, 2, 3), "t")
    SyncJob.run(src, dst, idCfg, Seq("id"))
    src.write(rows(1), "t") // rows 2,3 deleted upstream
    SyncJob.run(src, dst, idCfg, Seq("id"))
    assert(dst.read("t").get.count() === 3) // deletions never propagate
  }

  test("propagateDeletes drops vanished keys while the extract stays incremental (§2.4-1 opt-in)") {
    val (src, dst) = (tmpStore(), tmpStore())
    src.write(rows(1, 2, 3), "t")
    SyncJob.run(src, dst, idCfg, Seq("id"))
    // upstream: 2 deleted, 4 added; 1 and 3 unchanged
    src.write(rows(1, 3, 4), "t")
    val stats = SyncJob.run(src, dst, idCfg, Seq("id"), propagateDeletes = true)
    assert(stats.mode === "incremental id > 3") // extract is still the delta
    assert(dst.read("t").get.select("id").as[Long].collect().sorted === Seq(1L, 3L, 4L))
  }

  test("full-copy + propagateDeletes composes into full refresh: dest == source") {
    val (src, dst) = (tmpStore(), tmpStore())
    dst.write(Seq((1L, "stale"), (9L, "deleted-upstream")).toDF("id", "v"), "t")
    src.write(Seq((1L, "fresh"), (2L, "new")).toDF("id", "v"), "t")
    SyncJob.run(src, dst, TableConfig("t", None, None, Seq.empty), Seq("id"),
      propagateDeletes = true)
    val out = dst.read("t").get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "fresh", 2L -> "new"))
  }

  test("schema evolution opt-in: column added upstream flows in, old rows take NULL") {
    val (src, dst) = (tmpStore(), tmpStore())
    src.write(rows(1, 2), "t")
    SyncJob.run(src, dst, idCfg, Seq("id"))
    // upstream adds a column and a row; only id 3 is above the watermark
    src.write(Seq((1L, "v1", "en"), (2L, "v2", "en"), (3L, "v3", "de"))
      .toDF("id", "v", "lang"), "t")
    val s2 = SyncJob.run(src, dst, idCfg, Seq("id"), allowSchemaEvolution = true)
    assert(s2.mode === "incremental id > 2")
    val out = dst.read("t").get
    assert(out.columns.toSeq === Seq("id", "v", "lang")) // evolved (delta) shape
    val byId = out.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // pre-evolution rows: NULL in the added column; extracted row: populated
    assert(byId === Map(1L -> (("v1", null)), 2L -> (("v2", null)), 3L -> (("v3", "de"))))
  }

  test("schema drift WITHOUT the opt-in still fails loudly (strict parity)") {
    val (src, dst) = (tmpStore(), tmpStore())
    src.write(rows(1), "t")
    SyncJob.run(src, dst, idCfg, Seq("id"))
    src.write(Seq((2L, "v2", "en")).toDF("id", "v", "lang"), "t")
    intercept[Exception](SyncJob.run(src, dst, idCfg, Seq("id")))
  }

  test("schema evolution refuses dropped and retyped columns") {
    val (src, dst) = (tmpStore(), tmpStore())
    src.write(rows(1), "t")
    SyncJob.run(src, dst, idCfg, Seq("id"))
    // column dropped upstream
    src.write(Seq(Tuple1(2L)).toDF("id"), "t")
    val eDrop = intercept[IllegalArgumentException](
      SyncJob.run(src, dst, idCfg, Seq("id"), allowSchemaEvolution = true))
    assert(eDrop.getMessage.contains("dropped"))
    // column retyped upstream (v: string -> bigint)
    src.write(Seq((2L, 99L)).toDF("id", "v"), "t")
    val eType = intercept[IllegalArgumentException](
      SyncJob.run(src, dst, idCfg, Seq("id"), allowSchemaEvolution = true))
    assert(eType.getMessage.contains("retyped"))
  }

  test("upsertEvolving refuses non-nullable additions and added merge keys") {
    import graft.operators.Merge
    val base = Seq((1L, "a")).toDF("id", "v")
    // lit() literals are non-nullable: old rows could not satisfy the column
    val nonNull = intercept[IllegalArgumentException](
      Merge.upsertEvolving(base, base.withColumn("n", lit(5L)), Seq("id")))
    assert(nonNull.getMessage.contains("not nullable"))
    // an added column used as a merge key: the base has nothing to match on
    // when() without otherwise on a non-constant predicate stays nullable
    // (a constant-true predicate folds to a non-nullable literal)
    val nullable2 = base.withColumn("k2", when(col("id") > 0, lit(2L)))
    val addedPk = intercept[IllegalArgumentException](
      Merge.upsertEvolving(base, nullable2, Seq("id", "k2")))
    assert(addedPk.getMessage.contains("merge keys"))
  }

  test("strict > skips rows sharing the max timestamp (documented quirk)") {
    val (src, dst) = (tmpStore(), tmpStore())
    val mk = (pairs: Seq[(String, Long)]) => pairs.toDF("s", "id")
      .select(to_timestamp($"s").as("ts"), $"id")
    dst.write(mk(Seq(("2020-06-01 00:00:00", 1L))), "t")
    // a second row with the SAME timestamp as the watermark is skipped forever
    src.write(mk(Seq(("2020-06-01 00:00:00", 1L), ("2020-06-01 00:00:00", 99L),
      ("2020-07-01 00:00:00", 2L))), "t")
    val cfg = TableConfig("t", Some("ts"), Some(CheckType.Timestamp), Seq.empty)
    SyncJob.run(src, dst, cfg, Seq("id"))
    val ids = dst.read("t").get.select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L)) // 99 skipped: ts == watermark
  }
}
