package graft.functions

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  private def pieces(words: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(words)).toDF("ws")
      .select(BpeApply(col("ws"), merges).as("p"))
      .head().getSeq[String](0)

  test("merges replay in training order, chaining onto earlier fusions") {
    // (a,b) then (ab,c): "abc" -> [ab, c] -> [abc]
    assert(pieces(Seq("abc"), Seq(("a", "b"), ("ab", "c"))) === Seq("abc"))
    // unseen word: only the applicable prefix merges fire
    assert(pieces(Seq("zab"), Seq(("a", "b"), ("ab", "c"))) === Seq("z", "ab"))
    // multiple words flatten in order
    assert(pieces(Seq("ab", "ba"), Seq(("a", "b"))) === Seq("ab", "b", "a"))
  }

  test("left-to-right non-overlapping fuse, identical to the trainer's fold") {
    assert(pieces(Seq("aaa"), Seq(("a", "a"))) === Seq("aa", "a"))
    assert(pieces(Seq("aaaa"), Seq(("a", "a"))) === Seq("aa", "aa"))
    assert(pieces(Seq("aaa"), Seq(("a", "a"), ("aa", "a"))) === Seq("aaa"))
  }

  test("IN-ORDER semantics pinned: a later merge cannot resurrect an earlier pair") {
    // hand-constructed rank inversion — merge 0 wants (a, cd) before
    // merge 1 has created "cd". In-order replay skips merge 0 (cd not
    // yet a symbol) and never revisits it: [a, cd]. The rank-priority
    // variant would fuse to [acd]. Trainer-produced lists cannot contain
    // this inversion (a pair involving "cd" is only learnable AFTER the
    // (c,d) merge, i.e. at a higher rank), which is why train/apply
    // parity is exact — this spec pins the chosen semantics explicitly.
    assert(pieces(Seq("acd"), Seq(("a", "cd"), ("c", "d"))) === Seq("a", "cd"))
  }

  test("edge shapes: empty array, empty string, single chars, null element") {
    assert(pieces(Seq.empty[String], Seq(("a", "b"))) === Seq.empty)
    assert(pieces(Seq(""), Seq(("a", "b"))) === Seq.empty)
    assert(pieces(Seq("x"), Seq(("a", "b"))) === Seq("x"))
    val withNull = Seq(Tuple1(Seq[String]("ab", null, "b")))
      .toDF("ws").select(BpeApply(col("ws"), Seq(("a", "b"))).as("p"))
      .head().getSeq[String](0)
    assert(withNull === Seq("ab", "b"))
  }

  test("property: expression pieces equal bpeTrain's table on a random corpus") {
    val rnd = new scala.util.Random(31)
    val docs = (0 until 30).map { _ =>
      (0 until (1 + rnd.nextInt(6))).map(_ =>
        (0 until (1 + rnd.nextInt(6))).map(_ => "abc" (rnd.nextInt(3))).mkString
      ).mkString(" ")
    }.toDF("text")
    val (merges, trained) = TextAnalysis.bpeTrain(docs, "text", 5)
    val got = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w")).distinct()
      .select(col("w"), TextAnalysis.bpeEncode(col("w"), merges).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val want = trained.select(col("__w"), col("__syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got === want)
  }

  test("rejects non-array-of-string input and malformed merges") {
    intercept[IllegalArgumentException] {
      pieces(Seq("ab"), Seq(("", "b")))
    }
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(BpeApply(col("x"), Seq(("a", "b")))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }
}
