package graft.text

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat and the dog"),
    (2L, "the cat"),
    (3L, "zebra")).toDF("doc_id", "text")
  // counts: the=3, cat=2, and=1, dog=1, zebra=1

  test("build ranks by count desc then token, truncates, reserves id 0") {
    val v = Vocab.build(docs, "text", topN = 4).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("the") === ((3L, 1L)))
    assert(v("cat") === ((2L, 2L)))
    // count-1 tie broken alphabetically: and < dog < zebra; topN=4 keeps 2
    assert(v("and") === ((1L, 3L)))
    assert(v("dog") === ((1L, 4L)))
    assert(!v.contains("zebra"))
    assert(!v.values.map(_._2).toSet.contains(0L))
  }

  test("encode maps tokens positionally, OOV to 0, empty text to empty ids") {
    val v = Vocab.build(docs, "text", topN = 4)
    val e = Vocab.encode(docs.union(Seq((4L, "")).toDF("doc_id", "text")),
        "doc_id", "text", v)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(e(1L) === Seq(1L, 2L, 3L, 1L, 4L)) // the cat and the dog
    assert(e(3L) === Seq(0L))                 // zebra truncated away -> OOV
    assert(e(4L) === Seq.empty)
    // round-trip stability: the persisted-vocab contract — encoding with
    // the SAME vocab table twice is identical
    val again = Vocab.encode(docs, "doc_id", "text", v)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(e.filterKeys(_ != 4L).toMap === again)
  }

  test("encode rejects a vocabulary that assigns the reserved OOV id") {
    val bad = Seq(("x", 0L)).toDF("token", "token_id")
    intercept[IllegalArgumentException] {
      Vocab.encode(docs, "doc_id", "text", bad)
    }
  }

  test("encodeJoin is row-identical to encode, incl. OOV and empty docs") {
    val v = Vocab.build(docs, "text", topN = 4)
    val in = docs.union(Seq((4L, "")).toDF("doc_id", "text"))
    val j = Vocab.encodeJoin(in, "doc_id", "text", v)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(j(1L) === Seq(1L, 2L, 3L, 1L, 4L)) // positional order restored
    assert(j(3L) === Seq(0L))                 // OOV through the left join
    assert(j(4L) === Seq.empty)               // empty doc survives (_outer)
    val m = Vocab.encode(in, "doc_id", "text", v)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(j === m)
  }

  test("encodeJoin validates the vocabulary without collecting it") {
    intercept[IllegalArgumentException] {
      Vocab.encodeJoin(docs, "doc_id", "text",
        Seq(("x", 0L)).toDF("token", "token_id"))
    }
    intercept[IllegalArgumentException] {
      Vocab.encodeJoin(docs, "doc_id", "text",
        Seq(("x", 1L), ("x", 2L)).toDF("token", "token_id"))
    }
    intercept[IllegalArgumentException] {
      Vocab.encodeJoin(docs, "doc_id", "text",
        Seq.empty[(String, Long)].toDF("token", "token_id"))
    }
  }

  test("buildFromTokens + encodeTokens: pre-tokenized columns (the BPE-piece path)") {
    import org.apache.spark.sql.functions._
    // pieces already tokenized — e.g. bpeEncode output
    val pieces = Seq((1L, Seq("th", "e", "cat")), (2L, Seq("th", "e")),
      (3L, Seq("zeb", "ra")), (4L, Seq.empty[String]))
      .toDF("doc_id", "pieces")
    val v = Vocab.buildFromTokens(pieces, col("pieces"), topN = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // counts: th=2, e=2, cat=1, zeb=1, ra=1 -> ties alphabetical, top 3
    assert(v === Map("e" -> ((2L, 1L)), "th" -> ((2L, 2L)), "cat" -> ((1L, 3L))))
    val vdf = Vocab.buildFromTokens(pieces, col("pieces"), topN = 3)
    val e = Vocab.encodeTokens(pieces, "doc_id", col("pieces"), vdf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(e(1L) === Seq(2L, 1L, 3L))
    assert(e(3L) === Seq(0L, 0L)) // both OOV past the truncation
    assert(e(4L) === Seq.empty)   // empty piece arrays survive
    // the word path is exactly this machinery over the tokenizer
    val docs = Seq((9L, "the cat")).toDF("doc_id", "text")
    val wv = Vocab.build(docs, "text", 2)
    val viaJoin = Vocab.encodeJoin(docs, "doc_id", "text", wv)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaTokens = Vocab.encodeTokens(docs, "doc_id",
        TextAnalysis.tokens(col("text")), wv)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaJoin === viaTokens)
  }

  test("encodeJoin keeps repeated tokens at every position") {
    val v = Vocab.build(docs, "text", topN = 4)
    val rep = Seq((9L, "the the cat the")).toDF("doc_id", "text")
    val j = Vocab.encodeJoin(rep, "doc_id", "text", v)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(j(9L) === Seq(1L, 1L, 2L, 1L))
  }
}
