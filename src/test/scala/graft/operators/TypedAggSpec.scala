package graft.operators

import graft.SparkSpec

class TypedAggSpec extends SparkSpec {
  import spark.implicits._

  test("numStats fuses count/sum/min/max in one typed pass") {
    val out = Seq((1L, 5L), (1L, -3L), (1L, 9L), (2L, 0L)).toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(TypedAgg.numStats.toColumn)
      .collect().toMap
    assert(out(1L) === TypedAgg.NumStats(3L, 11L, -3L, 9L))
    assert(out(2L) === TypedAgg.NumStats(1L, 0L, 0L, 0L))
  }

  test("merge is associative/commutative with the empty buffer as identity") {
    val a = TypedAgg.NumStats(2L, 7L, 1L, 6L)
    val b = TypedAgg.NumStats(1L, -4L, -4L, -4L)
    val z = TypedAgg.numStats.zero
    assert(TypedAgg.numStats.merge(a, z) === a)
    assert(TypedAgg.numStats.merge(z, a) === a)
    assert(TypedAgg.numStats.merge(a, b) === TypedAgg.numStats.merge(b, a))
    val c = TypedAgg.NumStats(1L, 100L, 100L, 100L)
    assert(
      TypedAgg.numStats.merge(TypedAgg.numStats.merge(a, b), c) ===
        TypedAgg.numStats.merge(a, TypedAgg.numStats.merge(b, c)))
  }

  test("property: typed aggregate equals the columnar group aggregate") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 4L), Gen.choose(-1000L, 1000L)))
    val prop = Prop.forAll(gen) { rows =>
      val typed = rows.toDS()
        .groupByKey(_._1).mapValues(_._2)
        .agg(TypedAgg.numStats.toColumn)
        .collect().toMap
      val expected = rows.groupBy(_._1).map { case (k, vs0) =>
        val vs = vs0.map(_._2)
        k -> TypedAgg.NumStats(vs.length.toLong, vs.sum, vs.min, vs.max)
      }
      typed == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
