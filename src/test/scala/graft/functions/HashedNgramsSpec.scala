package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashedNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def grams(xs: Seq[Long], n: Int): Seq[Long] =
    Seq(Tuple1(xs)).toDF("h").select(HashedNgrams($"h", n)).head.getSeq[Long](0)

  test("sorted, distinct, one hash per unique window") {
    val out = grams(Seq(1L, 2L, 3L, 4L), 3) // windows (1,2,3), (2,3,4)
    assert(out.length === 2)
    assert(out === out.sorted)
    // repeated window collapses: (1,2,3) appears twice
    assert(grams(Seq(1L, 2L, 3L, 1L, 2L, 3L), 3).length < 4)
  }

  test("order sensitivity: reversed tokens yield different shingles") {
    assert(grams(Seq(1L, 2L, 3L, 4L), 3).toSet
      !== grams(Seq(4L, 3L, 2L, 1L), 3).toSet)
  }

  test("shorter than n -> empty; n=1 -> distinct element hashes") {
    assert(grams(Seq(1L, 2L), 3) === Seq.empty)
    assert(grams(Seq.empty, 2) === Seq.empty)
    assert(grams(Seq(5L, 5L, 6L), 1).length === 2)
  }

  test("deterministic across evaluations and identical for equal inputs") {
    val a = grams(Seq(10L, 20L, 30L, 40L, 50L), 2)
    val b = grams(Seq(10L, 20L, 30L, 40L, 50L), 2)
    assert(a === b)
  }

  test("shared windows produce shared hashes (Jaccard machinery intact)") {
    val a = grams(Seq(1L, 2L, 3L, 4L), 2).toSet // (1,2),(2,3),(3,4)
    val b = grams(Seq(9L, 2L, 3L, 4L), 2).toSet // (9,2),(2,3),(3,4)
    assert((a intersect b).size === 2)
  }
}
