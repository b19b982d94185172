package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** O9 — generated SQL matches the reference's generate_upsert_query shape
  * (db-sync-local/sync_utils.py:174-193), with identifiers quoted. */
class UpsertWriterSpec extends AnyFunSuite {

  test("with PKs: ON CONFLICT DO UPDATE over non-key columns only") {
    val sql = UpsertWriter.upsertSql("t", Seq("id", "a", "b"), Seq("id"))
    assert(sql ===
      """INSERT INTO "t" ("id", "a", "b") VALUES (?, ?, ?) ON CONFLICT ("id") DO UPDATE SET "a" = EXCLUDED."a", "b" = EXCLUDED."b"""")
  }

  test("composite key excluded from SET clause") {
    val sql = UpsertWriter.upsertSql("t", Seq("k1", "k2", "v"), Seq("k1", "k2"))
    assert(sql.contains("""ON CONFLICT ("k1", "k2") DO UPDATE SET "v" = EXCLUDED."v""""))
    assert(!sql.contains("""SET "k1""""))
  }

  test("all columns are keys -> DO NOTHING (insert-if-absent)") {
    val sql = UpsertWriter.upsertSql("t", Seq("a", "b"), Seq("a", "b"))
    assert(sql.endsWith("""ON CONFLICT ("a", "b") DO NOTHING"""))
  }

  test("no PKs -> plain INSERT (reference's no-PK branch)") {
    assert(UpsertWriter.upsertSql("t", Seq("a"), Seq.empty) ===
      """INSERT INTO "t" ("a") VALUES (?)""")
  }

  test("identifiers with quotes are escaped, unlike the reference (§2.4-8)") {
    assert(UpsertWriter.quoteId("""we"ird""") === "\"we\"\"ird\"")
  }
}
