package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CoerceSpec extends SparkSpec {
  import spark.implicits._

  test("intish tolerates float-string forms like int(float('3.0'))") {
    val out = Seq("3.0", "42", "7.9", "x", null).toDF("v")
      .select(Coerce.intish(col("v")).as("v")).collect().map(_.get(0))
    // int(float("7.9")) == 7: cast truncates toward zero like Python int()
    assert(out.toSeq === Seq(3L, 42L, 7L, null, null))
  }

  test("strip trims ALL whitespace kinds like str.strip(), NULL passthrough") {
    // tabs/newlines/CR must strip too — Python's strip() is not space-only
    val out = Seq("  a b  ", "\t\n a b \r\n", null).toDF("v")
      .select(Coerce.strip(col("v")).as("v")).collect().map(_.get(0))
    assert(out.toSeq === Seq("a b", "a b", null))
  }

  test("arrayOrEmpty: NULL -> [] (sync_utils.py:86-94)") {
    val df = Seq((1, Seq("a")), (2, null)).toDF("id", "arr")
    val out = df.select(Coerce.arrayOrEmpty(col("arr"), StringType).as("arr"))
      .collect().map(_.getSeq[String](0))
    assert(out.toSeq === Seq(Seq("a"), Seq()))
  }

  test("frame dispatches per type: typed ints pass through, strings trimmed, arrays defaulted") {
    val df = Seq((1L, " pad ", Seq(1, 2)), (2L, "x", null))
      .toDF("id", "s", "arr")
    val out = Coerce.frame(df).orderBy("id").collect()
    assert(out(0) === Row(1L, "pad", Seq(1, 2)))
    assert(out(1) === Row(2L, "x", Seq()))
  }

  test("frame repairs marked jsonb columns, unparseable -> NULL") {
    val df = Seq((1L, "{'k': 1}"), (2L, "junk{")).toDF("id", "j")
    val out = Coerce.frame(df, jsonColumns = Set("j")).orderBy("id").collect()
    assert(out(0).getString(1) === """{"k": 1}""")
    assert(out(1).isNullAt(1))
  }
}
