package graft.streaming

import graft.SparkSpec

class StreamScaleSpec extends SparkSpec {

  test("partitionsFor: unknown/failed input keeps the pinned session value") {
    val pinned = spark.sessionState.conf.numShufflePartitions
    assert(StreamScale.partitionsFor(spark, 0L) === pinned)
    assert(StreamScale.partitionsFor(spark, -1L) === pinned)
    // bytesOf on a missing path reports Long.MaxValue (conservative BIG)
    val b = StreamScale.bytesOf(spark, "/nonexistent/graft-streamscale-spec")
    assert(b === Long.MaxValue)
    assert(StreamScale.partitionsFor(spark, b) === pinned)
  }

  test("partitionsFor: sub-advisory input derives 1; derivation is monotone and capped") {
    val advisory = spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    val pinned = spark.sessionState.conf.numShufflePartitions
    assert(StreamScale.partitionsFor(spark, 1L) === 1)
    assert(StreamScale.partitionsFor(spark, advisory) === 1)
    assert(StreamScale.partitionsFor(spark, advisory + 1) === math.min(2, pinned))
    // at-scale inputs saturate at the pinned production value — the
    // helper must never RAISE the configured partitioning
    assert(StreamScale.partitionsFor(spark, Long.MaxValue / 2) === pinned)
  }

  test("withStreamShuffle scopes the conf and restores it, even on failure") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val seen = StreamScale.withStreamShuffle(spark, 1L) { spark.conf.get(key) }
    assert(seen === "1")
    assert(spark.conf.get(key) === before)
    intercept[RuntimeException] {
      StreamScale.withStreamShuffle(spark, 1L) { sys.error("boom") }
    }
    assert(spark.conf.get(key) === before)
  }

  test("bytesOf sums real file sizes (driver-side stat, no job)") {
    val tmp = java.nio.file.Files.createTempDirectory("streamscale").toFile
    try {
      val f = new java.io.File(tmp, "a.bin")
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](1234)(1))
      assert(StreamScale.bytesOf(spark, tmp.toString) === 1234L)
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }
}
