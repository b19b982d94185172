package graft.sync

import graft.SparkSpec
import graft.config.{CheckType, TableConfig}
import org.apache.spark.sql.functions._

/** JdbcStore integration tests against embedded Derby (on Spark's own
  * classpath — no new dependency): the read-classification and write-staging
  * contracts that the unit-level TableStoreSpec can only simulate. */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  /** Fresh in-memory database per test: isolation without cleanup. */
  private def freshStore(): JdbcStore = {
    n += 1
    new JdbcStore(spark, s"jdbc:derby:memory:graft_spec_$n;create=true", Map.empty)
  }

  test("read of a missing table maps to None (bootstrap), not an error") {
    val store = freshStore()
    store.write(Seq((1L, "a")).toDF("id", "v"), "present") // creates the db
    assert(store.read("does_not_exist").isEmpty) // Derby 42X05 classified
    assert(store.read("present").isDefined)
  }

  test("read against an unreachable database rethrows instead of None") {
    // no create=true and never created: connection-level failure, which
    // must NOT be mistaken for 'table missing' (SyncJob would bootstrap
    // and overwrite the destination with the delta alone)
    val broken = new JdbcStore(spark, "jdbc:derby:memory:graft_never_created", Map.empty)
    intercept[Exception](broken.read("t"))
  }

  test("write replaces contents and is safe when the plan reads its own table") {
    val store = freshStore()
    store.write(Seq((1L, "old"), (2L, "old")).toDF("id", "v"), "t")
    // the merge pattern: new contents derived FROM the current contents
    val merged = graft.operators.Merge.upsert(
      store.read("t").get, Seq((2L, "new"), (3L, "new")).toDF("id", "v"), Seq("id"))
    store.write(merged, "t")
    val out = store.read("t").get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "old", 2L -> "new", 3L -> "new"))
  }

  test("write with an EVOLVED schema recreates the table instead of truncate-then-fail") {
    val store = freshStore()
    store.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "t")
    // evolved frame: extra nullable column. A truncate-first write would
    // empty the table and then fail the INSERT (physical table lacks the
    // column) — the schema probe must take the recreate path instead.
    val evolved = graft.operators.Merge.upsertEvolving(
      store.read("t").get,
      Seq((2L, "b2", "en"), (3L, "c", "de")).toDF("id", "v", "lang"), Seq("id"))
    store.write(evolved, "t")
    val out = store.read("t").get
    assert(out.columns.map(_.toLowerCase).toSeq === Seq("id", "v", "lang"))
    val byId = out.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byId === Map(1L -> (("a", null)), 2L -> (("b2", "en")), 3L -> (("c", "de"))))
  }

  test("SyncJob end-to-end over JDBC: bootstrap, incremental, schema evolution") {
    val (src, dst) = (freshStore(), freshStore())
    val cfg = TableConfig("t", Some("id"), Some(CheckType.Id), Seq.empty)
    src.write(Seq((1L, "v1"), (2L, "v2")).toDF("id", "v"), "t")
    val s1 = SyncJob.run(src, dst, cfg, Seq("id")) // dest missing -> full copy
    assert(s1.mode === "full" || s1.mode.startsWith("incremental id > 0"))
    assert(dst.read("t").get.count() === 2)
    src.write(Seq((1L, "v1"), (2L, "v2"), (3L, "v3"), (4L, "v4")).toDF("id", "v"), "t")
    SyncJob.run(src, dst, cfg, Seq("id"))
    assert(dst.read("t").get.count() === 4)
    // upstream adds a column; evolving sync must converge without data loss
    src.write(Seq((1L, "v1", "en"), (2L, "v2", "en"), (3L, "v3", "en"),
      (4L, "v4", "en"), (5L, "v5", "de")).toDF("id", "v", "lang"), "t")
    SyncJob.run(src, dst, cfg, Seq("id"), allowSchemaEvolution = true)
    val out = dst.read("t").get.collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out === Map(1L -> None, 2L -> None, 3L -> None, 4L -> None, 5L -> Some("de")))
  }
}
