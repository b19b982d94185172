package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events.ts boundary normalizer: every physical testdata generation
  * must present the same engine-facing column (bigint UTC epoch nanos). */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events.ts is bigint nanos regardless of the on-disk parquet type") {
    val ev = Tables(spark, dir, "events")
    assert(ev.schema("ts").dataType === LongType)
    // value check against the raw read on a bounded sample (a full-table
    // sum of epoch nanos overflows long)
    val raw = Tables.raw(spark, dir, "events")
    val got = ev.orderBy("event_id").select(col("ts")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val want = (raw.schema("ts").dataType match {
      case LongType => raw.orderBy("event_id").select(col("ts")).limit(5)
      case _ => raw.orderBy("event_id")
        .select((unix_micros(col("ts").cast(TimestampType)) * 1000L).as("ts")).limit(5)
    }).collect().map(_.getLong(0)).toSeq
    assert(got === want)
  }

  test("withTsNanos passes a LongType ts through untouched (no extra projection)") {
    import spark.implicits._
    val df = Seq((1L, 42L)).toDF("event_id", "ts")
    assert(Tables.withTsNanos(df) eq df)
  }

  test("withTsNanos converts TIMESTAMP_NTZ micros to epoch nanos under UTC") {
    import spark.implicits._
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(1234567L)).cast(TimestampNTZType))
    val out = Tables.withTsNanos(df)
    assert(out.schema("ts").dataType === LongType)
    assert(out.select(col("ts")).head.getLong(0) === 1234567000L)
  }

  test("withTsNanos fails fast on an unexpected physical type") {
    import spark.implicits._
    val df = Seq((1L, "oops")).toDF("event_id", "ts")
    assertThrows[IllegalStateException](Tables.withTsNanos(df))
  }
}
