package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val members = (0L until 1000L).toDF("k")

  private lazy val sketch: Array[Byte] = members
    .agg(Sketches.bloomAgg(col("k"), 1000L, 8000L).as("bf"))
    .head.getAs[Array[Byte]](0)

  test("bloom filter has ZERO false negatives over its members") {
    val misses = members
      .select(Sketches.mightContain(sketch, col("k")).as("hit"))
      .filter(!col("hit")).count()
    assert(misses === 0L)
  }

  test("false-positive rate on absent keys is bounded (~3% at 8 bits/key)") {
    val fps = (1000000L until 1010000L).toDF("k")
      .select(Sketches.mightContain(sketch, col("k")).as("hit"))
      .filter(col("hit")).count()
    assert(fps < 1000L, s"expected < 10% FP at 8 bits/key, got $fps/10000")
  }

  test("registered as SQL functions via GraftExtensions") {
    GraftExtensions.register(spark)
    members.createOrReplaceTempView("bloom_members")
    val bytes = spark.sql(
      "SELECT graft_bloom_agg(k, 1000L, 8000L) AS bf FROM bloom_members")
      .head.getAs[Array[Byte]](0)
    assert(bytes.nonEmpty)
    // probe side must be foldable — inline the sketch as a literal
    val hit = spark.sql("SELECT graft_bloom_might_contain(" +
      s"X'${bytes.map("%02x".format(_)).mkString}', 42L) AS h")
      .head.getBoolean(0)
    assert(hit)
  }
}
