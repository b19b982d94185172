package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // user 1: events at t=0,10,100 with gap 50 -> sessions {0,10} and {100}
  // user 2: single event
  private val events = Seq(
    (1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 100L),
    (2L, 4L, 5L)).toDF("user_id", "event_id", "ts")

  test("withSessionIndex numbers sessions per key by gap") {
    val out = Sessionize.withSessionIndex(events, "user_id", "ts", lit(50L), Seq("event_id"))
      .select("event_id", "session_idx")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("sessionStats counts events and sessions per key") {
    val out = Sessionize.sessionStats(events, "user_id", "ts", lit(50L), Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 3L, 2L), (2L, 1L, 1L)))
  }

  test("sessionStatsNative matches the inclusive lag form on exact-boundary gaps") {
    // gaps of exactly 60s (must MERGE — inclusive boundary in BOTH forms)
    // and 60s + 1us (must SPLIT) — the adversarial boundary inputs
    val us = Seq(0L, 60000000L, 120000001L).map(t => (1L, 1000000000L + t))
    val df = us.toDF("user_id", "us")
    val lagForm = Sessionize.sessionStats(df, "user_id", "us", lit(60000000L)).head
    val native = Sessionize.sessionStatsNative(
      df.select(col("user_id"), timestamp_micros(col("us")).as("ts")),
      "user_id", "ts", "60000000 microseconds").head
    assert((lagForm.getLong(1), lagForm.getLong(2)) === ((3L, 2L)))
    assert((native.getLong(1), native.getLong(2)) === ((3L, 2L)))
  }
}
