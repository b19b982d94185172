package graft.sync

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("id", "v")
  private def fp(df: org.apache.spark.sql.DataFrame) = {
    val r = Checksum.tableChecksum(df, cols).head
    (r.getLong(0), r.getLong(1), r.getDecimal(2))
  }

  test("fingerprint is invariant under repartitioning and row order") {
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
    val base = fp(df)
    assert(fp(df.repartition(13, $"id")) === base)
    assert(fp(df.orderBy($"id".desc)) === base)
    assert(fp(df.repartition(1)) === base)
  }

  test("fingerprint detects a dropped row, a changed value, and a duplicate") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val base = fp(df)
    assert(fp(df.filter($"id" =!= 50L)) !== base)
    assert(fp(df.withColumn("v", when($"id" === 50L, "x").otherwise($"v"))) !== base)
    // a duplicated row XOR-cancels; count and sum still catch it
    assert(fp(df.union(df.filter($"id" === 50L))) !== base)
  }

  test("duplicate-pair swap is caught by the decimal sum even where xor cancels") {
    // A = {r1, r1}, B = {r2, r2}: xor of both is 0 — sum/count must differ
    val a = Seq((1L, "x"), (1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y"), (2L, "y")).toDF("id", "v")
    val (na, xa, sa) = fp(a)
    val (nb, xb, sb) = fp(b)
    assert(xa === 0L && xb === 0L && na === nb)
    assert(sa !== sb)
  }

  test("a cross-column null shift changes the fingerprint") {
    // (x, NULL) vs (NULL, x) — the column-shift drift a null-skipping
    // hash (raw xxhash64) cannot see
    val a = Seq((Some("x"), Option.empty[String])).toDF("id", "v")
    val b = Seq((Option.empty[String], Some("x"))).toDF("id", "v")
    assert(fpS(a) !== fpS(b))
    // and NULL is distinct from a genuine empty string
    val c = Seq((Some(""), Option.empty[String])).toDF("id", "v")
    val d = Seq((Option.empty[String], Some(""))).toDF("id", "v")
    assert(fpS(c) !== fpS(d))
  }

  private def fpS(df: org.apache.spark.sql.DataFrame) = {
    val r = Checksum.tableChecksum(df, cols).head
    (r.getLong(0), r.getLong(1), r.getDecimal(2))
  }

  test("empty table fingerprints as (0, null-xor, null-sum) consistently") {
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    val r = Checksum.tableChecksum(empty, cols).head
    assert(r.getLong(0) === 0L)
  }
}
