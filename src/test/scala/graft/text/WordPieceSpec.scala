package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq(
    "h", "u", "g", "s", "t", "e", "hug", "hugs", "th", "the",
    "##h", "##u", "##g", "##s", "##e", "##ging", "##gin",
    "##in", "##i", "##n")

  private def enc(w: String, v: Seq[String] = vocab,
                  maxChars: Int = 100): Seq[String] =
    Seq(w).toDF("w")
      .select(graft.functions.WordPieceEncode(array(col("w")), v,
        WordPiece.DefaultUnkToken, maxChars).as("p"))
      .head.getSeq[String](0)

  test("greedy longest-match-first with ## continuation") {
    // "hugs" matches whole; "hugging" = hug + ##ging (longest at each step)
    assert(enc("hugs") === Seq("hugs"))
    assert(enc("hugging") === Seq("hug", "##ging"))
    // longest FIRST piece wins even when a shorter one also covers:
    // "the" -> [the], never [th, ##e] or [t, ##h, ##e]
    assert(enc("the") === Seq("the"))
    assert(WordPiece.encodeWordReference("the", vocab.toSet, "[UNK]", 100)
      === Seq("the"))
  }

  test("all-or-nothing: a mid-word miss yields one UNK for the whole word") {
    // 'x' has no plain or ## entry: the word segments partway then dies
    assert(enc("hugx") === Seq("[UNK]"))
    // a word STARTING with an unmatchable char dies immediately
    assert(enc("xhug") === Seq("[UNK]"))
    assert(WordPiece.encodeWordReference("hugx", vocab.toSet, "[UNK]", 100)
      === Seq("[UNK]"))
  }

  test("maxInputChars caps a word to UNK before any matching") {
    assert(enc("hugs", maxChars = 3) === Seq("[UNK]"))
    assert(enc("hug", maxChars = 3) === Seq("hug"))
    assert(WordPiece.encodeWordReference("hugs", vocab.toSet, "[UNK]", 3)
      === Seq("[UNK]"))
  }

  test("expression and reference agree on every corpus word") {
    val words = Seq("hugs", "hugging", "the", "thin", "tin", "xq",
      "hugginghugging", "t", "s", "gin")
    val got = words.toDF("w")
      .select(col("w"), graft.functions.WordPieceEncode(array(col("w")),
        vocab, "[UNK]", 10).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    words.foreach { w =>
      assert(got(w) ===
        WordPiece.encodeWordReference(w, vocab.toSet, "[UNK]", 10), s"word $w")
    }
  }

  test("trainer: delta path == full recount == driver reference") {
    val docs = Seq(
      (1L, "hug hug hug pug pug pun bun hugs"),
      (2L, "hug pug pun pun bun hugs hugs"),
      (3L, "hug hug pun pug bun")).toDF("doc_id", "text")
    val n = 4
    val (dm, dw) = WordPiece.wordPieceTrain(docs, "text", n)
    val (fm, fw) = WordPiece.wordPieceTrainFullRecount(docs, "text", n)
    assert(dm === fm)
    assert(dm.size === n)
    val wf = TextAnalysis.bpeWordTable(docs, "text")
      .select(col("__w"), col("__c")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val (rm, rsyms) = WordPiece.wordPieceTrainReference(wf, n)
    assert(dm === rm)
    // the canonical toy example: ##g+##s is the highest-gain first merge
    // (hugs/pugs-style corpora fuse the rare suffix pair first, unlike
    // BPE's raw-count argmax — the score DIVIDES by parent frequencies)
    val refFinal = rsyms.map { case (v, _) => v.mkString(" ") }.toSet
    val gotDelta = dw.select(concat_ws(" ", col("__syms"))).collect()
      .map(_.getString(0)).toSet
    val gotFull = fw.select(concat_ws(" ", col("__syms"))).collect()
      .map(_.getString(0)).toSet
    assert(gotDelta === refFinal)
    assert(gotFull === refFinal)
  }

  test("fuse strips the continuation marker positionally") {
    assert(WordPiece.fuse("hug", "##s") === "hugs")
    assert(WordPiece.fuse("##gi", "##ng") === "##ging")
    assert(WordPiece.fuse("t", "##h") === "th")
  }

  test("vocabulary = alphabet (plain + ##) plus fused merges, deduplicated") {
    val docs = Seq((1L, "ab ab ba")).toDF("doc_id", "text")
    val (m, words) = WordPiece.wordPieceTrain(docs, "text", 1)
    val v = WordPiece.vocabulary(words, m)
    // the full initial alphabet is recovered even for symbols a merge
    // consumed out of every word (here the winning pair's parents)
    assert(v.contains("a") && v.contains("b") && v.contains("##a") && v.contains("##b"))
    assert(m.size === 1)
    assert(v.contains(WordPiece.fuse(m.head.left, m.head.right)))
    assert(v === v.distinct.sorted)
    // and equals the wordTable-derived alphabet formulation exactly
    val scanned = WordPiece.wordTable(docs, "text")
      .select(explode(col("__syms")).as("s")).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(v === (scanned ++ m.map(x => WordPiece.fuse(x.left, x.right)))
      .distinct.sorted)
  }

  test("degenerate vocab: rejects empties, duplicates, bare ##") {
    intercept[IllegalArgumentException] { enc("x", Seq("a", "a")) }
    intercept[IllegalArgumentException] { enc("x", Seq("")) }
    intercept[IllegalArgumentException] { enc("x", Seq("##")) }
    intercept[IllegalArgumentException] {
      WordPiece.wordPieceTrain(Seq((1L, "a")).toDF("doc_id", "text"), "text", 0)
    }
  }
}
