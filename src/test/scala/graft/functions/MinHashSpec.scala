package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class MinHashSpec extends SparkSpec {
  import spark.implicits._

  /** The original higher-order-function formulation the codegen'd
    * expression replaced — kept here as the parity reference. */
  private def hofSignature(shingleHashes: org.apache.spark.sql.Column, numHashes: Int) = {
    val P = 2147483647L
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(shingleHashes, h =>
        pmod(pmod(h, lit(P)) * (i * 2 + 1) + (i * 12345 + 7), lit(P)))))
  }

  test("codegen'd signature is BIT-IDENTICAL to the HOF formulation") {
    val prop = Prop.forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { xs =>
      val df = Seq(Tuple1(xs)).toDF("h")
      val rows = df.select(
          MinHashSignature($"h", 16).as("fast"),
          hofSignature($"h", 16).as("ref"))
        .head
      rows.getSeq[Any](0) == rows.getSeq[Any](1)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("empty input mirrors array_min-of-empty: all-NULL slots") {
    val sig = Seq(Tuple1(Seq.empty[Long])).toDF("h")
      .select(MinHashSignature($"h", 8)).head.getSeq[Any](0)
    assert(sig.length === 8 && sig.forall(_ == null))
  }

  test("signature values are in [0, P) and identical sets sign identically") {
    val a = Seq(Tuple1(Seq(7L, -3L, 99L))).toDF("h")
      .select(MinHashSignature($"h", 128)).head.getSeq[Long](0)
    assert(a.length === 128)
    assert(a.forall(v => v >= 0L && v < 2147483647L))
    val b = Seq(Tuple1(Seq(99L, 7L, -3L))).toDF("h") // order must not matter
      .select(MinHashSignature($"h", 128)).head.getSeq[Long](0)
    assert(a === b)
  }
}
