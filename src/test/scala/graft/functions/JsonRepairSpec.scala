package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Semantics matrix for the reference's two-stage JSONB quote repair
  * (db-sync-local/sync_utils.py:97-126). Pure function — no Spark needed. */
class JsonRepairSpec extends AnyFunSuite {

  test("valid JSON passes through unchanged") {
    assert(JsonRepair.repair("""{"a": 1}""") === Some("""{"a": 1}"""))
  }

  test("outer single quotes stripped (sync_utils.py:101-103)") {
    assert(JsonRepair.repair("""'{"a": 1}'""") === Some("""{"a": 1}"""))
  }

  test("doubled single quotes become double quotes (sync_utils.py:104-105)") {
    assert(JsonRepair.repair("{''a'': 1}") === Some("""{"a": 1}"""))
  }

  test("stage 2: single quotes become double quotes (sync_utils.py:117-121)") {
    assert(JsonRepair.repair("{'a': 1}") === Some("""{"a": 1}"""))
  }

  test("stage 2 runs on the stage-1-mutated value, like the reference") {
    // Stage 1 turns '' into " leaving mixed quotes; stage 2 then flips
    // ' -> " and "" -> ' on that mutated string.
    assert(JsonRepair.repair("{''a'': 'b'}") === Some("""{"a": "b"}"""))
  }

  test("unparseable after both stages -> None (lossy, SURVEY 2.4-5)") {
    assert(JsonRepair.repair("not json at all {") === None)
  }

  test("NULL passthrough") {
    assert(JsonRepair.repair(null) === None)
  }
}
