package graft.text

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // "rare" appears only in doc 1; "the" in all three; "cat" in two
  private val docs = Seq(
    (1L, "the rare cat"),
    (2L, "the cat cat"),
    (3L, "the dog"))
    .toDF("doc_id", "text")

  test("termFrequencies counts within-doc occurrences") {
    val tf = TfIdf.termFrequencies(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tf((2L, "cat")) === 2L)
    assert(tf((1L, "cat")) === 1L)
    assert(tf.keys.count(_._1 == 3L) === 2)
  }

  test("docFrequencies counts DOCUMENTS, not occurrences") {
    val df = TfIdf.docFrequencies(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df === Map("the" -> 3L, "cat" -> 2L, "rare" -> 1L, "dog" -> 1L))
  }

  test("scored: tfidf = tf * (ln((N+1)/(df+1)) + 1), corpus-wide term downweighted") {
    val s = TfIdf.scored(docs, "doc_id", "text", corpusSize = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    val expectRare = 1.0 * (math.log(4.0 / 2.0) + 1)
    assert(math.abs(s((1L, "rare")) - expectRare) < 1e-12)
    // ubiquitous term: idf = ln(4/4) + 1 = 1 -> tfidf == tf
    assert(math.abs(s((1L, "the")) - 1.0) < 1e-12)
    assert(s((1L, "rare")) > s((1L, "the")))
  }

  test("rarestTokens picks lowest df with token tie-break") {
    val r = TfIdf.rarestTokens(docs, "doc_id", "text", k = 1)
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) === (("rare", 1L, 1L)))
    assert(r(2L) === (("cat", 2L, 2L)))  // cat (df 2) beats the (df 3)
    assert(r(3L) === (("dog", 1L, 1L)))
  }
}
