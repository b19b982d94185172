package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side integer PageRank reference: same micro base, same floor
    * transfer, same damping — independent of the DataFrame loop. */
  private def ref(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val wout = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 0 until iters) {
      val c = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case (s, d, w) =>
        c(d) = c.getOrElse(d, 0L) + (pr(s) * w) / wout(s)
      }
      pr = nodes.map(n => n -> (150000L + (850L * c.getOrElse(n, 0L)) / 1000L)).toMap
    }
    pr
  }

  test("wordGraph counts directed bigram adjacencies with source out-weights") {
    val g = TextRank.wordGraph(Seq("a b a b c", "b a").toDF("text"), "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // edges: a->b x2, b->a x2 (one in doc1, one in doc2), b->c x1
    assert(g(("a", "b")) === ((2L, 2L)))     // wout(a) = 2
    assert(g(("b", "a")) === ((2L, 3L)))     // wout(b) = 2 + 1
    assert(g(("b", "c")) === ((1L, 3L)))
  }

  test("pageRank matches the driver reference over a hand graph, per round") {
    val edges = Seq(("a", "b", 2L), ("b", "a", 2L), ("b", "c", 1L), ("c", "a", 5L))
    val df = edges.toDF("src", "dst", "w")
    val withOut = df.join(
      df.groupBy("src").agg(sum("w").as("wout")), Seq("src"))
    for (iters <- Seq(0, 1, 3)) {
      val got = TextRank.pageRank(withOut, iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === ref(edges, iters), s"iters=$iters")
    }
  }

  test("dangling mass drops identically: sink node keeps receiving, sends nothing") {
    val edges = Seq(("a", "sink", 1L))
    val df = edges.toDF("src", "dst", "w")
      .withColumn("wout", lit(1L))
    val got = TextRank.pageRank(df, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === ref(edges, 2))
    // sink contributes nothing back: a is base-only after round 1
    assert(got("a") === 150000L)
  }

  test("keywords: total (pr DESC, node) order, dense ranks") {
    val kw = TextRank.keywords(
      Seq("the data the data the merge").toDF("text"), "text", iters = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(kw.map(_._3).toSeq === Seq(1L, 2L, 3L))
    // ties (if any) break by node name; list is sorted by (pr desc, node)
    assert(kw.sortBy(x => (-x._2, x._1)).toSeq === kw.toSeq)
  }
}
