package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 1000L).map(i => (i, s"s${i % 7}")).toDF("id", "src")

  test("hashSplit: ~80/20, disjoint, exhaustive, and STABLE under growth") {
    val split = Sampling.hashSplit(docs, "id", 80)
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") + counts("test") === 1000)
    assert(math.abs(counts("train") - 800) <= 50, s"train=${counts("train")}")
    // growth stability: splitting a LARGER corpus must not move old rows
    val grown = (1L to 2000L).map(i => (i, s"s${i % 7}")).toDF("id", "src")
    val before = split.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val after = Sampling.hashSplit(grown, "id", 80)
      .filter($"id" <= 1000).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before === after)
  }

  test("capPerKey keeps exactly min(n, group size) rows, chosen by the order") {
    val capped = Sampling.capPerKey(docs, Seq("src"), Seq(col("id").asc), 3)
    val byKey = capped.groupBy("src").agg(count(lit(1)).as("n"),
        collect_list("id").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](2).sorted).toMap
    assert(byKey.values.forall(_.size === 3))
    // s1 holds ids 1, 8, 15, ... -> the 3 smallest survive
    assert(byKey("s1") === Seq(1L, 8L, 15L))
    val tiny = Seq((1L, "only")).toDF("id", "src")
    assert(Sampling.capPerKey(tiny, Seq("src"), Seq(col("id")), 3).count() === 1)
  }
}
