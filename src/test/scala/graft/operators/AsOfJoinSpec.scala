package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{max, struct}
import org.scalacheck.{Gen, Prop, Test => SCTest}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // facts: (key, time, price)
  private val quotes = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 9.0)).toDF("k", "qt", "price")

  // queries: (key, time, id)
  private val trades = Seq(
    ("a", 5L, 1L),   // before any quote -> null
    ("a", 20L, 2L),  // exactly simultaneous -> inclusive match (2.0)
    ("a", 25L, 3L),  // between quotes -> latest prior (2.0)
    ("a", 99L, 4L),  // after all -> 3.0
    ("b", 16L, 5L),  // other key -> 9.0, never a's quotes
    ("c", 50L, 6L))  // key with no facts at all -> null
    .toDF("k", "tt", "id")

  test("backward as-of picks the latest fact at or before each left time") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tt", "qt")
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[Any]("price")), Option(r.getAs[Any]("qt")))).toMap
    assert(out(1L) === (None, None))
    assert(out(2L) === (Some(2.0), Some(20L)))  // inclusive at equal time
    assert(out(3L) === (Some(2.0), Some(20L)))
    assert(out(4L) === (Some(3.0), Some(30L)))
    assert(out(5L) === (Some(9.0), Some(15L)))  // keys never cross
    assert(out(6L) === (None, None))
  }

  test("left columns and row count are preserved (left-outer semantics)") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tt", "qt")
    assert(out.count() === trades.count())
    assert(out.columns.toSet === Set("k", "tt", "id", "qt", "price"))
  }

  test("payload name clash with a left column is rejected loudly") {
    val bad = quotes.withColumnRenamed("price", "id")
    val e = intercept[IllegalArgumentException](
      AsOfJoin.backward(trades, bad, Seq("k"), "tt", "qt"))
    assert(e.getMessage.contains("id"))
  }

  test("matched right row is taken atomically: NULL payload values stay NULL") {
    // the latest quote before t=25 is (qt=20, price=NULL, sz=7): whole-row
    // semantics (DuckDB ASOF / pandas merge_asof) must emit price=NULL, not
    // back-fill 1.0 from the OLDER qt=10 row — the per-column-last bug
    val sparseQuotes = Seq(
      ("a", 10L, Some(1.0), Some(5L)),
      ("a", 20L, None, Some(7L))).toDF("k", "qt", "price", "sz")
    val out = AsOfJoin.backward(
        Seq(("a", 25L, 1L)).toDF("k", "tt", "id"), sparseQuotes, Seq("k"), "tt", "qt")
      .collect().head
    assert(out.getAs[Long]("qt") === 20L)
    assert(out.isNullAt(out.fieldIndex("price")))
    assert(out.getAs[Long]("sz") === 7L)
  }

  test("a matched right row whose payload is ALL NULL still beats no-match") {
    // a non-null struct of all-null fields must not be skipped by
    // ignoreNulls — qt rides in the payload so this is observable there
    val quotes = Seq(("a", 10L, Option.empty[Double])).toDF("k", "qt", "price")
    val out = AsOfJoin.backward(
        Seq(("a", 25L, 1L)).toDF("k", "tt", "id"), quotes, Seq("k"), "tt", "qt")
      .collect().head
    assert(out.getAs[Long]("qt") === 10L)
    assert(out.isNullAt(out.fieldIndex("price")))
  }

  test("agrees with the brute-force range-join argmax on a planted case") {
    val brute = trades.as("t").join(quotes.as("q"),
        $"t.k" === $"q.k" && $"q.qt" <= $"t.tt", "left")
      .groupBy($"t.id")
      .agg(max(struct($"q.qt", $"q.price")).as("m"))
      .select($"id", $"m.price".as("price"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("price"))).toMap
    val asof = AsOfJoin.backward(trades, quotes, Seq("k"), "tt", "qt")
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("price"))).toMap
    assert(asof === brute)
  }

  test("property: as-of == in-memory latest-at-or-before on random timelines") {
    // right side unique per (key, time) by construction (the operator's
    // documented determinism precondition)
    val rightGen = Gen.mapOf(Gen.zip(
      Gen.zip(Gen.oneOf("u", "v"), Gen.choose(0L, 100L)), Gen.choose(0L, 999L)))
      .map(_.toSeq.map { case ((k, t), p) => (k, t, p) })
    val leftGen = Gen.listOf(Gen.zip(Gen.oneOf("u", "v"), Gen.choose(0L, 100L)))
      .map(_.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
    val prop = Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      if (ls.isEmpty) true
      else {
        val left = ls.toDF("k", "tt", "id")
        val right = rs.toDF("k", "qt", "p")
        val out = AsOfJoin.backward(left, right, Seq("k"), "tt", "qt")
          .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("p"))).toMap
        val expected = ls.map { case (k, t, i) =>
          i -> rs.filter(r => r._1 == k && r._2 <= t)
            .sortBy(_._2).lastOption.map(_._3)
        }.toMap
        out == expected.map { case (k, v) => k -> v.map(x => x: Any) }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
