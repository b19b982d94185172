package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 1000 rows of one hot key + a long tail
  private def skewed = ((1 to 1000).map(i => ("hot", i.toLong)) ++
    (1 to 10).map(i => (s"cold$i", i.toLong))).toDF("k", "v")

  test("saltedCount equals plain groupBy count") {
    val salted = SkewJoin.saltedCount(skewed, Seq("k"), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("spreadIdentical spreads fully identical duplicate rows across buckets") {
    // 1000 IDENTICAL rows: the pure row-hash salt maps them all to one
    // bucket (no spread); the position-mixed salt spreads them
    val dups = (1 to 1000).map(_ => ("hot", 1L)).toDF("k", "v")
    def bucketsUsed(spread: Boolean) =
      dups.select(SkewJoin.saltColumn(dups, 8, spreadIdentical = spread).as("s"))
        .distinct().count()
    assert(bucketsUsed(false) === 1)
    assert(bucketsUsed(true) >= 4)
    // correctness is unchanged: the salted aggregate still folds to one row
    val n = SkewJoin.saltedCount(dups, Seq("k"), buckets = 8, spreadIdentical = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n === Map("hot" -> 1000L))
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("missing", "M")).toDF("k", "label")
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", buckets = 4)
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val plain = skewed.join(dim, "k")
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === plain)
  }
}
