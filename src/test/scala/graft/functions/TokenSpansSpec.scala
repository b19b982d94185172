package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenSpansSpec extends SparkSpec {
  import spark.implicits._

  private def spansOf(s: String): Seq[(Long, Long)] = {
    val r = Seq(Option(s)).toDF("t")
      .select(TokenSpans(col("t")).as("s")).head
    if (r.isNullAt(0)) null
    else r.getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getLong(0), e.getLong(1)))
  }

  test("maximal [a-zA-Z0-9]+ runs with [start, end) offsets") {
    assert(spansOf("ab c12-X") === Seq((0L, 2L), (3L, 6L), (7L, 8L)))
    // matches the engine's token COUNT on the same text
    val (n, k) = Seq("ab c12-X").toDF("t")
      .select(graft.text.TextAnalysis.tokenCount(col("t")),
        size(TokenSpans(col("t")))).as[(Long, Int)].head()
    assert(n === k.toLong)
  }

  test("offsets are CODE POINTS: astral chars advance by one") {
    // 😀 is one code point (two UTF-16 units): 'ok' starts at cp 3
    assert(spansOf("a😀 ok") === Seq((0L, 1L), (3L, 5L)))
  }

  test("1:1 unicode lowercasing agrees with the lower()-based counter (Kelvin sign)") {
    // U+212A KELVIN SIGN lowercases to 'k': a raw ASCII-range class
    // would split "aKb" into two runs where tokenCount sees one
    val (n, k) = Seq("aKb c").toDF("t")
      .select(graft.text.TextAnalysis.tokenCount(col("t")),
        size(TokenSpans(col("t")))).as[(Long, Int)].head()
    assert(n === 2L && k === 2)
  }

  test("edges: empty, no tokens, all tokens, trailing run, NULL") {
    assert(spansOf("") === Seq.empty)
    assert(spansOf("!?  —") === Seq.empty)
    assert(spansOf("abc") === Seq((0L, 3L)))
    assert(spansOf(".ab") === Seq((1L, 3L)))
    assert(spansOf(null) === null)
  }
}
