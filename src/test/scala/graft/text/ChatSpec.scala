package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ChatSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("msgs", ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType)))))))

  private def df(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("render: uniform role-generic template, document order") {
    val d = df(Row(1L, Seq(Row("system", "be brief"), Row("user", "hi"),
      Row("assistant", "hello"))))
    val got = d.select(Chat.render(col("msgs"))).head.getString(0)
    assert(got ===
      "<|system|>\nbe brief<|end|>\n<|user|>\nhi<|end|>\n<|assistant|>\nhello<|end|>\n")
    // an unknown role follows the same rule — no whitelist to drift
    val tool = df(Row(1L, Seq(Row("tool", "42"))))
      .select(Chat.render(col("msgs"))).head.getString(0)
    assert(tool === "<|tool|>\n42<|end|>\n")
  }

  test("assistantSpans: spans slice the rendered text back to the turn contents") {
    val d = df(
      Row(1L, Seq(Row("user", "what is 2+2?"), Row("assistant", "four"),
        Row("user", "and 3+3?"), Row("assistant", "six"))),
      Row(2L, Seq(Row("user", "no assistant here"))))
    val rows = d.select(col("id"), Chat.render(col("msgs")).as("r"),
        Chat.assistantSpans(col("msgs")).as("s")).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    val rendered = r1.getString(1)
    val spans = r1.getSeq[Row](2)
    assert(spans.map(_.getInt(0)) === Seq(1, 3)) // assistant turn indexes
    // THE law: every span slices the rendered text back to its content
    assert(spans.map(s => rendered.substring(
      s.getLong(1).toInt, s.getLong(2).toInt)) === Seq("four", "six"))
    // prefix/suffix stay OUTSIDE every span (masked)
    assert(spans.forall(s =>
      rendered.substring(s.getLong(1).toInt - 2, s.getLong(1).toInt) == ">\n"))
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getSeq[Row](2) === Seq.empty) // no assistant turn, no span
  }

  test("fitBudget: strict prefix, assistant-ending trim, empty when no completion fits") {
    val d = df(
      // tokens per content: 2, 1, 4, 1 — budget 3 keeps turns 0-1 (cum 3),
      // turn 2 overflows and STOPS consumption (turn 3 must not sneak in)
      Row(1L, Seq(Row("user", "hi there"), Row("assistant", "yo"),
        Row("user", "a b c d"), Row("assistant", "x"))),
      // the budgeted prefix ends on a USER turn -> trimmed back to turn 1
      Row(2L, Seq(Row("user", "a"), Row("assistant", "b"), Row("user", "c"))),
      // no assistant turn fits the budget -> empty conversation
      Row(3L, Seq(Row("user", "a b c d e f"), Row("assistant", "late"))))
    val got = d.select(col("id"),
      Chat.fitBudget(col("msgs"), maxTokens = 3L).as("kept")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Row](1).map(m =>
        (m.getString(0), m.getString(1)))).toMap
    assert(got(1L) === Seq(("user", "hi there"), ("assistant", "yo")))
    assert(got(2L) === Seq(("user", "a"), ("assistant", "b")))
    assert(got(3L) === Seq.empty)
    // invalid turns skip without consuming budget
    val messy = df(Row(4L, Seq(null, Row("user", "a"), Row(null, "zz"),
      Row("assistant", "b c"))))
    val kept = messy.select(Chat.fitBudget(col("msgs"), 3L)).head.getSeq[Row](0)
    assert(kept.map(m => (m.getString(0), m.getString(1)))
      === Seq(("user", "a"), ("assistant", "b c")))
  }

  /** CODE-POINT slice — the span contract (Spark length / Python str
    * semantics). JVM String.substring counts UTF-16 units, which differs
    * once supplementary-plane chars appear; tests must slice the way the
    * contract states. */
  private def cpSlice(s: String, start: Long, end: Long): String = {
    val a = s.offsetByCodePoints(0, start.toInt)
    val b = s.offsetByCodePoints(a, (end - start).toInt)
    s.substring(a, b)
  }

  test("property: the slicing law holds on random conversations (astral chars included)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val roleGen = Gen.oneOf("user", "assistant", "system", "tool")
    // contents spanning BMP multi-byte AND supplementary-plane chars —
    // offsets are code points; an emoji is 1 code point, 2 UTF-16 units
    val contentGen = Gen.listOf(Gen.oneOf("hi", "café", "naïve", "x y", "",
      "😀", "a🚀b")).map(_.mkString(" "))
    val convGen = Gen.choose(0, 6)
      .flatMap(n => Gen.listOfN(n, Gen.zip(roleGen, contentGen)))
    val prop = Prop.forAll(Gen.listOfN(4, convGen)) { convs =>
      val rows = convs.zipWithIndex.map { case (c, i) =>
        Row(i.toLong, c.map { case (r, t) => Row(r, t) }) }
      val got = df(rows: _*).select(col("id"), Chat.render(col("msgs")).as("r"),
        Chat.assistantSpans(col("msgs")).as("s")).collect()
      got.forall { row =>
        val conv = convs(row.getLong(0).toInt)
        val rendered = row.getString(1)
        val spans = row.getSeq[Row](2)
        // every span CODE-POINT-slices back to its turn's content, and
        // the span set covers exactly the assistant turns
        spans.forall { s =>
          cpSlice(rendered, s.getLong(1), s.getLong(2)) == conv(s.getInt(0))._2
        } && spans.map(_.getInt(0)) ==
          conv.zipWithIndex.filter(_._1._1 == "assistant").map(_._2)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("degrade: invalid turns render nothing and mask nothing; NULL array is NULL") {
    val d = df(
      Row(1L, Seq(Row("user", "a"), null, Row(null, "x"), Row("assistant", null),
        Row("assistant", "ok"))),
      Row(2L, null))
    val r1 = d.filter(col("id") === 1L).select(Chat.render(col("msgs")),
      Chat.assistantSpans(col("msgs"))).head
    assert(r1.getString(0) === "<|user|>\na<|end|>\n<|assistant|>\nok<|end|>\n")
    val spans = r1.getSeq[Row](1)
    // the valid assistant turn keeps its ORIGINAL index (4) and its span
    // accounts only for rendered turns
    assert(spans.map(_.getInt(0)) === Seq(4))
    assert(r1.getString(0).substring(spans.head.getLong(1).toInt,
      spans.head.getLong(2).toInt) === "ok")
    val r2 = d.filter(col("id") === 2L).select(Chat.render(col("msgs")),
      Chat.assistantSpans(col("msgs"))).head
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  test("tokenMask: the token-index interval is exactly the turn's content tokens; straddlers clamp") {
    import graft.functions.TokenSpans
    val d = df(Row(1L, Seq(Row("user", "what is 2+2?"),
      Row("assistant", "it is four"), Row("assistant", "ok"))))
    val r = d.select(Chat.render(col("msgs")).as("rendered"),
      Chat.tokenMask(TokenSpans(Chat.render(col("msgs"))),
        Chat.assistantSpans(col("msgs"))).as("m")).head
    val masks = r.getSeq[Row](1).map(m =>
      (m.getInt(0), m.getLong(1), m.getLong(2)))
    // rendered tokens: user|what|is|2|2|end|assistant|it|is|four|end|assistant|ok|end
    //                  0    1    2  3 4 5   6         7  8  9    10  11        12 13
    assert(masks === Seq((1, 7L, 10L), (2, 12L, 13L)))
    // degenerate span INSIDE one token clamps to empty, never negative
    val clamped = d.select(Chat.tokenMask(
      TokenSpans(Chat.render(col("msgs"))),
      // a fake 1-char span strictly inside the 'what' token
      array(struct(lit(1).as("turn"), lit(10L).as("span_start"),
        lit(11L).as("span_end")))).as("m")).head.getSeq[Row](0)
    assert(clamped.map(m => (m.getLong(1), m.getLong(2)))
      .forall { case (s, e) => e === s })
    // NULL propagation
    val n = d.select(Chat.tokenMask(TokenSpans(lit(null).cast("string")),
      Chat.assistantSpans(col("msgs")))).head
    assert(n.isNullAt(0))
  }

  test("lint: counters, the gate, and the valid-subsequence adjacency law") {
    val d = df(
      // clean two-turn conversation: everything passes
      Row(1L, Seq(Row("user", "hi"), Row("assistant", "hello"))),
      // assistant opener: no prompt -> starts_ok false, all else clean
      Row(2L, Seq(Row("assistant", "hi"), Row("user", "x"),
        Row("assistant", "y"))),
      // same-role pair + whitespace-only content + dangling user tail
      Row(3L, Seq(Row("user", "a"), Row("user", "  "),
        Row("assistant", "b"), Row("user", "tail"))),
      // an INVALID turn between two assistant turns: the lint sees what
      // the trainer sees, so the pair must still count
      Row(4L, Seq(Row("user", "q"), Row("assistant", "a1"),
        Row(null, "x"), Row("assistant", "a2"))),
      // all turns invalid: nothing valid to start or end anything
      Row(5L, Seq(Row(null, null))),
      Row(6L, null))
    val got = d.select(col("id"), Chat.lint(col("msgs")).as("l")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getStruct(1)))
      .toMap
    def f(id: Long) = {
      val s = got(id)
      (s.getAs[Int]("n_valid"), s.getAs[Int]("n_invalid"),
        s.getAs[Boolean]("starts_ok"), s.getAs[Boolean]("ends_assistant"),
        s.getAs[Int]("same_role_pairs"), s.getAs[Int]("empty_turns"),
        s.getAs[Boolean]("passed"))
    }
    assert(f(1L) === ((2, 0, true, true, 0, 0, true)))
    assert(f(2L) === ((3, 0, false, true, 0, 0, false)))
    assert(f(3L) === ((4, 0, true, false, 1, 1, false)))
    assert(f(4L) === ((3, 1, true, true, 1, 0, false)))
    assert(f(5L) === ((0, 1, false, false, 0, 0, false)))
    assert(got(6L) === null) // absent conversation, not an empty one
  }
}
