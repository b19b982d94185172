package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "good great fine good", 1L),
    (2L, "bad awful bad poor", -1L),
    (3L, "good fine nice", 1L),
    (4L, "poor bad sad awful", -1L),
    (5L, "great nice good great", 1L),
    (6L, "awful sad poor sad", -1L)).toDF("doc_id", "text", "y")

  private def model(rounds: Int, dims: Int = 8) = {
    val feats = Classifier.hashedTokenFeatures(docs, "doc_id", "text", dims = dims)
    val df = Classifier.docFeatures(feats, docs.select(col("doc_id"), col("y")), "doc_id")
    (df, Classifier.train(df, "doc_id", dims = dims, rounds = rounds,
      lrMicros = 10L, marginMicros = 1000000L))
  }

  test("train matches the driver-side reference round for round") {
    val feats = Classifier.hashedTokenFeatures(docs, "doc_id", "text", dims = 8)
    val rows = feats.join(docs.select(col("doc_id"), col("y")), Seq("doc_id"))
      .groupBy(col("doc_id"), col("y"))
      .agg(collect_list(struct(col("f"), col("x"))).as("fs"))
      .collect().map { r =>
        (r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2)
          .map(p => (p.getLong(0), p.getLong(1))))
      }.toSeq
    for (rounds <- Seq(1, 2, 3)) {
      val (_, m) = model(rounds)
      val ref = Classifier.trainReference(rows, dims = 8, rounds = rounds,
        lrMicros = 10L, marginMicros = 1000000L)
      assert(m === ref, s"round $rounds")
    }
  }

  test("a separable corpus separates: all predictions correct after training") {
    // dims = 32: every token gets its own bucket (at 8/16, opposing-class
    // tokens collide and the hashed corpus is genuinely not separable)
    val (df, m) = model(3, dims = 32)
    val scored = Classifier.score(df, "doc_id", m)
      .join(docs.select(col("doc_id"), col("y")), Seq("doc_id"))
    assert(scored.filter(col("pred") =!= col("y")).count() === 0)
    // and the margins are genuinely nonzero in the right direction
    assert(scored.filter(col("y") * col("margin_micros") <= 0).count() === 0)
  }

  test("round 0 is the zero model; margins are then bias-only zeros") {
    val (df, m) = model(0)
    assert(m.weights.values.forall(_ == 0L) && m.biasMicros === 0L)
    val scored = Classifier.score(df, "doc_id", m)
    assert(scored.select(max(abs(col("margin_micros")))).head.getLong(0) === 0L)
    // zero margin -> pred -1 by the strict > rule
    assert(scored.filter(col("pred") =!= -1L).count() === 0)
  }

  test("docs with no features ride on the bias (empty fs from the right join)") {
    val labels = Seq((7L, 1L)).toDF("doc_id", "y")
    val feats = Classifier.hashedTokenFeatures(
      Seq((7L, "")).toDF("doc_id", "text"), "doc_id", "text", dims = 8)
    val df = Classifier.docFeatures(feats, labels, "doc_id")
    assert(df.count() === 1)
    assert(df.select(size(col("__fs"))).head.getInt(0) === 0)
    val m = Classifier.LinearModel((0L until 8L).map(_ -> 5L).toMap, 123L)
    val s = Classifier.score(df, "doc_id", m)
    assert(s.head.getLong(1) === 123L)
  }

  test("feature hashing is the md5 convention the DuckDB oracle mirrors") {
    val f = Classifier.hashedTokenFeatures(
      Seq((1L, "good good bad")).toDF("doc_id", "text"), "doc_id", "text", dims = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graftf:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      java.lang.Long.parseLong(hex, 16) % 8
    }
    assert(f(bucket("good")) === 2L)
    assert(f(bucket("bad")) === (if (bucket("bad") == bucket("good")) 3L else 1L))
  }

  test("trainJoin is bit-identical to train, round for round") {
    val (df, _) = model(0)
    for (rounds <- Seq(0, 1, 2, 3)) {
      val m = Classifier.train(df, "doc_id", dims = 8, rounds = rounds,
        lrMicros = 10L, marginMicros = 1000000L)
      val w = Classifier.trainJoin(df, "doc_id", dims = 8, rounds = rounds,
        lrMicros = 10L, marginMicros = 1000000L)
      val got = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === m.weights + (-1L -> m.biasMicros), s"rounds $rounds")
      graft.Checkpoints.release(w)
    }
  }

  test("scoreJoin is row-identical to score, broadcast or shuffled") {
    val (df, m) = model(3)
    val want = Classifier.score(df, "doc_id", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val wt = Classifier.weightsTable(spark, m)
    for (bcast <- Seq(true, false)) {
      val got = Classifier.scoreJoin(df, "doc_id", wt, broadcastWeights = bcast)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(got === want, s"broadcastWeights=$bcast")
    }
  }

  test("scoreJoin rides empty-feature docs on the bias row") {
    val df = Classifier.docFeatures(
      Classifier.hashedTokenFeatures(
        Seq((7L, "")).toDF("doc_id", "text"), "doc_id", "text", dims = 8),
      Seq((7L, 1L)).toDF("doc_id", "y"), "doc_id")
    val m = Classifier.LinearModel((0L until 8L).map(_ -> 5L).toMap, 123L)
    val s = Classifier.scoreJoin(df, "doc_id", Classifier.weightsTable(spark, m))
    assert(s.head.getLong(1) === 123L)
  }

  test("trainJoin fails closed on a feature bucket outside [0, dims)") {
    val feats = Seq((1L, 9L, 1L)).toDF("doc_id", "f", "x")
    val df = Classifier.docFeatures(feats, Seq((1L, 1L)).toDF("doc_id", "y"), "doc_id")
    val e = intercept[IllegalArgumentException] {
      Classifier.trainJoin(df, "doc_id", dims = 8, rounds = 1,
        lrMicros = 10L, marginMicros = 1000000L)
    }
    assert(e.getMessage.contains("[0, 8)"))
  }

  test("train fails closed on a feature bucket outside [0, dims)") {
    // dims mismatch between the feature table and train(): the strict
    // margin lookup would silently drop the doc every round otherwise
    val feats = Seq((1L, 9L, 1L)).toDF("doc_id", "f", "x")
    val df = Classifier.docFeatures(feats, Seq((1L, 1L)).toDF("doc_id", "y"), "doc_id")
    val e = intercept[IllegalArgumentException] {
      Classifier.train(df, "doc_id", dims = 8, rounds = 1,
        lrMicros = 10L, marginMicros = 1000000L)
    }
    assert(e.getMessage.contains("[0, 8)"))
  }
}
