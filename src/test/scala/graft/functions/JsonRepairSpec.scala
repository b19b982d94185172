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

/** The Catalyst-expression form must agree with the pure function on the
  * whole semantics matrix, under BOTH evaluation modes — whole-stage
  * codegen (doGenCode) and interpreted fallback (nullSafeEval). */
class JsonRepairExprSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  private val matrix = Seq(
    """{"a": 1}""", """'{"a": 1}'""", "{''a'': 1}", "{'a': 1}",
    "{''a'': 'b'}", "not json at all {", null)

  private def run(codegen: String): Seq[Option[String]] = {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      import spark.implicits._
      matrix.toDF("v").withColumn("__ord", monotonically_increasing_id())
        .select(col("__ord"), JsonRepair(col("v")).as("r"))
        .orderBy("__ord").collect().map(r => Option(r.getString(1))).toSeq
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("expression matches the pure function under codegen and interpreted eval") {
    val expected = matrix.map(JsonRepair.repair)
    assert(run("CODEGEN_ONLY") === expected)
    assert(run("NO_CODEGEN") === expected)
  }
}
