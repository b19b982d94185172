package graft.operators

import graft.SparkSpec

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("forwardFillGrid densifies each key's span and carries values forward") {
    val obs = Seq((1L, 10L, 100L), (1L, 13L, 130L), (2L, 5L, 50L))
      .toDF("k", "bk", "v")
    val out = GapFill.forwardFillGrid(obs, "k", "bk", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (1L, 10L) -> 100L, (1L, 11L) -> 100L, (1L, 12L) -> 100L, (1L, 13L) -> 130L,
      (2L, 5L) -> 50L))
  }

  test("grids never extend beyond a key's own observed bounds") {
    val obs = Seq((1L, 10L, 1L), (2L, 100L, 2L), (2L, 101L, 3L)).toDF("k", "bk", "v")
    val out = GapFill.forwardFillGrid(obs, "k", "bk", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L), (2L, 100L), (2L, 101L)))
  }

  test("a fresh observation overrides the carried value, then carries on") {
    val obs = Seq((1L, 0L, 5L), (1L, 3L, 8L), (1L, 6L, 2L)).toDF("k", "bk", "v")
    val vals = GapFill.forwardFillGrid(obs, "k", "bk", "v")
      .orderBy("bk").collect().map(_.getLong(2)).toSeq
    assert(vals === Seq(5L, 5L, 5L, 8L, 8L, 8L, 2L))
  }

  test("strict mode fails loudly on duplicate (key, bucket) rows") {
    val dup = Seq((1L, 10L, 100L), (1L, 10L, 999L), (2L, 5L, 50L)).toDF("k", "bk", "v")
    val e = intercept[Exception] {
      GapFill.forwardFillGrid(dup, "k", "bk", "v", strict = true).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("expected at most 1")), e.toString)
  }

  test("strict mode on clean input matches the default path exactly") {
    val obs = Seq((1L, 10L, 100L), (1L, 13L, 130L), (2L, 5L, 50L)).toDF("k", "bk", "v")
    def run(strict: Boolean) =
      GapFill.forwardFillGrid(obs, "k", "bk", "v", strict = strict)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(strict = true) === run(strict = false))
  }

  test("property: fill equals the latest observation at or before each bucket") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // per key: a small set of distinct buckets with values
    val obsGen = Gen.mapOf(Gen.zip(
      Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 30L)), Gen.choose(-100L, 100L)))
      .map(_.toSeq.map { case ((k, bk), v) => (k, bk, v) })
    val prop = Prop.forAll(obsGen) { obs =>
      if (obs.isEmpty) true
      else {
        val out = GapFill.forwardFillGrid(obs.toDF("k", "bk", "v"), "k", "bk", "v")
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        val expected = obs.groupBy(_._1).flatMap { case (k, rows) =>
          val bks = rows.map(_._2)
          (bks.min to bks.max).map { bk =>
            (k, bk) -> rows.filter(_._2 <= bk).maxBy(_._2)._3
          }
        }
        out == expected
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
