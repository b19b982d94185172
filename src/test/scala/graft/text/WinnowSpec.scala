package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: tokenize, md5-hex each k-gram, slide windows of
    * w (suffix-truncated to one window when ng < w), pick the lexicographic
    * min with the RIGHTMOST position on ties. */
  private def refWinnow(text: String, k: Int, w: Int): Set[(Long, String)] = {
    val ts = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
    if (ts.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ghs = (0 to ts.length - k).map(i => md5hex(ts.slice(i, i + k).mkString(" ")))
    val ng = ghs.length
    (0 to math.max(ng - w, 0)).flatMap { p =>
      val win = (p until math.min(p + w, ng)).map(j => (ghs(j), j))
      val minH = win.map(_._1).min
      val pos = win.filter(_._1 == minH).map(_._2).max
      Some((pos.toLong, minH))
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int = 3, w: Int = 4) =
    Winnow.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("fingerprints match the brute-force winnowing reference") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "a a b a a b a a b"), // heavy gram repetition -> tie paths
      (4L, "one two"), //  < k tokens: nothing
      (5L, "one two three four")) // ng=2 < w: single truncated window
    val got = run(docs).groupBy(_._1)
      .map { case (id, rows) => id -> rows.map(r => (r._2, r._3)).toSet }
    docs.foreach { case (id, text) =>
      val want = refWinnow(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) === want, s"doc $id")
    }
    assert(!got.contains(4L))
    assert(got(5L).size === 1)
  }

  test("rightmost tie-break: identical grams select the window's last position") {
    // every 3-gram of "z z z z z z z" is identical; window p selects p+3
    val got = run(Seq((1L, "z z z z z z z"))) // 7 tokens -> ng=5, windows p=0,1
    assert(got.map(_._2).toSet === Set(3L, 4L))
    assert(got.map(_._3).toSet.size === 1)
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // distinct prefixes/suffixes, one planted 6-token (= w+k-1) common run
    val shared = "sigma tau upsilon phi chi psi"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"omicron pi rho $shared nu xi"))
    val fps = run(docs)
    val h1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert(h1.intersect(h2).nonEmpty)
  }

  test("an integer hasher (xxhash64) keeps the winnowing properties") {
    import org.apache.spark.sql.functions.xxhash64
    val shared = "sigma tau upsilon phi chi psi"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"omicron pi rho $shared nu xi"),
      (3L, "one two")).toDF("doc_id", "text")
    def run() = Winnow.fingerprints(docs, "doc_id", "text", 3, 4, xxhash64(_))
    assert(run().schema("fp").dataType ===
      org.apache.spark.sql.types.LongType)
    val fps = run().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // deterministic across runs (build and probe must agree)
    assert(fps.toSet === run().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // the guarantee holds under ANY total hash order
    val h1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert(h1.intersect(h2).nonEmpty)
    assert(!fps.exists(_._1 == 3L)) // < k tokens still emits nothing
    // density: one fingerprint per window at most, at least one per doc
    val ng1 = 11 - 2 // doc 1: 11 tokens -> 9 grams -> 6 windows of 4
    assert(fps.count(_._1 == 1L) >= 1 && fps.count(_._1 == 1L) <= ng1 - 4 + 1)
  }

  test("property: fingerprints equal the brute-force reference on random tie-heavy docs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny alphabet -> frequent repeated grams -> the tie paths get hit
    val docGen = Gen.listOfN(5,
      Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc"))))
    val prop = Prop.forAll(docGen) { toks =>
      val df = toks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Winnow.fingerprints(df, "doc_id", "text", 3, 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = toks.zipWithIndex.flatMap { case (ts, i) =>
        refWinnow(ts.mkString(" "), 3, 4).map { case (p, h) => (i.toLong, p, h) }
      }.toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("overlapCandidates pairs on shared fingerprints, gated by df and minShared") {
    val shared = "sigma tau upsilon phi chi psi omega kappa lambda"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta"),
      (2L, s"omicron pi rho $shared nu xi iota"),
      (3L, "unrelated words entirely different from all other documents here"))
    val fps = Winnow.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", 3, 4)
    val pairs = Winnow.overlapCandidates(fps, "doc_id", minShared = 2, maxDocsPerFp = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 >= 2L)
    // a df gate of 1 drops every shared fingerprint -> no pairs survive
    val gated = Winnow.overlapCandidates(fps, "doc_id", minShared = 1, maxDocsPerFp = 1)
      .collect()
    assert(gated.isEmpty)
  }

  test("gateIndex over accumulated indexRows equals a from-scratch build") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "iota kappa lambda mu nu xi omicron pi"),
      (3L, "alpha beta gamma delta rho sigma tau upsilon"))
    val df = docs.toDF("doc_id", "text")
    // batch-by-batch accumulation (the overlapIndexIngest per-batch unit)
    val acc = docs.map(d => Winnow.indexRows(Seq(d).toDF("doc_id", "text"),
        "doc_id", "text"))
      .reduce(_ unionByName _)
    val served = Winnow.gateIndex(acc, "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = Winnow.buildOverlapIndex(df, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(served === batch)
    assert(served.nonEmpty)
  }

  test("snapshotIndex materializes gateIndex(raw); a refresh re-gates retroactively") {
    val tmp = java.nio.file.Files.createTempDirectory("winnow_snap").toString
    val store = new graft.sync.ParquetStore(spark, tmp)
    val phrase = "alpha beta gamma delta epsilon zeta"
    def rows(docs: Seq[(Long, String)]) =
      Winnow.indexRows(docs.toDF("doc_id", "text"), "doc_id", "text")
    // seed batch appended TWICE (the retry replay shape the snapshot's
    // distinct collapse must absorb), with ingest-style lineage stamps
    val seed = Seq((1L, s"$phrase eta theta iota"))
    store.append(rows(seed).withColumn("__run", lit(0L)), "fps")
    store.append(rows(seed).withColumn("__run", lit(1L)), "fps")
    Winnow.snapshotIndex(store, "doc_id", maxDocsPerFp = 2)
    def snap() = store.read("fps_gated").get
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val first = snap()
    assert(first === Winnow.gateIndex(store.read("fps").get, "doc_id", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    assert(first.nonEmpty)
    // two arrivals repeat the phrase -> its fps cross maxDf=2; the NEXT
    // refresh must drop them from the served snapshot retroactively
    store.append(rows(Seq((2L, s"$phrase kappa lambda mu"),
      (3L, s"$phrase nu xi omicron"))).withColumn("__run", lit(2L)), "fps")
    Winnow.snapshotIndex(store, "doc_id", maxDocsPerFp = 2)
    val second = snap()
    assert(second === Winnow.gateIndex(store.read("fps").get, "doc_id", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    assert(first.map(_._1).diff(second.map(_._1)).nonEmpty)
    // a store with no raw table fails with the diagnostic, not an NPE
    val err = intercept[RuntimeException] {
      Winnow.snapshotIndex(new graft.sync.ParquetStore(spark,
        java.nio.file.Files.createTempDirectory("winnow_snap_e").toString), "doc_id")
    }
    assert(err.getMessage.contains("no fps table"))
  }

  test("gateIndex drops a fingerprint RETROACTIVELY once arrivals make it hot") {
    // seed: one doc holds the phrase (df=1, under a maxDf=2 gate); two
    // arrivals repeat it -> df=3 crosses the gate, and the SEED's own
    // rows must vanish from the served view, not just the arrivals'
    val phrase = "alpha beta gamma delta epsilon zeta"
    val seed = Seq((1L, s"$phrase eta theta iota"))
    val arrivals = Seq((2L, s"$phrase kappa lambda mu"),
      (3L, s"$phrase nu xi omicron"))
    val acc = (seed ++ arrivals).map(d =>
        Winnow.indexRows(Seq(d).toDF("doc_id", "text"), "doc_id", "text"))
      .reduce(_ unionByName _)
    val seedOnly = Winnow.gateIndex(
      Winnow.indexRows(seed.toDF("doc_id", "text"), "doc_id", "text"),
      "doc_id", maxDocsPerFp = 2)
      .collect().map(_.getString(0)).toSet
    val after = Winnow.gateIndex(acc, "doc_id", maxDocsPerFp = 2)
      .filter($"doc_id" === 1L).collect().map(_.getString(0)).toSet
    // every fingerprint of the shared phrase that all three docs selected
    // was served pre-arrival and is gone post-arrival
    val hot = seedOnly.diff(after)
    assert(hot.nonEmpty)
    // and it equals the batch rebuild's verdict over the full corpus
    val batch = Winnow.buildOverlapIndex((seed ++ arrivals).toDF("doc_id", "text"),
        "doc_id", "text", maxDocsPerFp = 2)
      .filter($"doc_id" === 1L).collect().map(_.getString(0)).toSet
    assert(after === batch)
  }
}
