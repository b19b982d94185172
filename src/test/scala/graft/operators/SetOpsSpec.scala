package graft.operators

import graft.SparkSpec

/** O15/O16 — blob-name set algebra (gcs_sync.py:36-62). */
class SetOpsSpec extends SparkSpec {
  import spark.implicits._

  private def names(xs: String*) = xs.toDF("name")

  test("difference = files to copy (source − dest), distinct") {
    val out = SetOps.difference(names("a", "b", "c", "c"), names("b"), Seq("name"))
      .collect().map(_.getString(0)).sorted
    assert(out.toSeq === Seq("a", "c"))
  }

  test("intersection = already existing, distinct") {
    val out = SetOps.intersection(names("a", "b", "b"), names("b", "c"), Seq("name"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("b"))
  }

  test("ordered listing matches sorted()") {
    val out = SetOps.ordered(names("c", "a", "b"), Seq("name"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("a", "b", "c"))
  }
}
