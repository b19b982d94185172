package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("graft_dot is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head
    assert(r.getDouble(0) === 11.0)
  }

  test("graft_intersect_size from SQL over sorted bigint arrays") {
    val r = spark.sql(
      "SELECT graft_intersect_size(array(1L, 5L, 9L), array(5L, 9L, 12L)) AS n").head
    assert(r.getLong(0) === 2L)
  }

  test("graft_simhash64 from SQL returns 64 bits") {
    val r = spark.sql("SELECT graft_simhash64(array(xxhash64('a'), xxhash64('b'))) AS s").head
    assert(r.getSeq[Int](0).length === 64)
  }

  test("graft_url_norm is callable from SQL; fail-NULL surfaces as SQL NULL") {
    val r = spark.sql(
      "SELECT graft_url_norm('HTTP://E.com:80/p?utm_a=1&b=2#f') AS u, " +
        "graft_url_norm('no-scheme') AS bad").head
    assert(r.getString(0) === "http://e.com/p?b=2")
    assert(r.isNullAt(1))
  }

  test("graft_simhash_packed packs the same bits; SQL hamming via bit_count") {
    val r = spark.sql(
      """SELECT graft_simhash64(array(xxhash64('a'))) AS bits,
        |       graft_simhash_packed(array(xxhash64('a'))) AS packed,
        |       bit_count(graft_simhash_packed(array(xxhash64('a')))
        |         ^ graft_simhash_packed(array(xxhash64('b')))) AS h""".stripMargin).head
    val repacked = r.getSeq[Int](0).zipWithIndex
      .foldLeft(0L) { case (acc, (b, j)) => if (b == 1) acc | (1L << j) else acc }
    assert(repacked === r.getLong(1))
    assert(r.getInt(2) > 0 && r.getInt(2) <= 64) // different tokens differ
  }
}
