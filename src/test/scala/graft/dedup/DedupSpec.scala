package graft.dedup

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (3L, "completely different content about spark engines"),
    (4L, "spark engines about content different completely")) // permutation of 3
    .toDF("doc_id", "text")

  test("exact dedup keeps smallest id per distinct text") {
    val out = Dedup.exact(docs, "text", "doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(0L, 2L, 3L, 4L))
  }

  test("wordNgrams builds ordered trigram shingles; short docs get empty set") {
    val tri = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
      .select($"doc_id", Dedup.wordNgrams($"text", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(tri(1L) === Seq("a b c", "b c d"))
    assert(tri(2L) === Seq())
  }

  test("hashedShingles is sorted ascending (merge-scan precondition)") {
    val hs = docs.select(Dedup.hashedShingles(TextAnalysis.tokenSet($"text")).as("h"))
      .collect().map(_.getSeq[Long](0))
    hs.foreach(a => assert(a === a.sorted))
  }

  test("minhash LSH over unigram sets finds exact and same-word-set dups") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        TextAnalysis.tokenSet, num = 9, den = 10, numHashes = 128, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (0,1) identical; (3,4) same word set (unigram J = 1); (0,2)/(1,2)
    // differ by one word in nine -> J = 8/10 < 0.9, excluded
    assert(pairs === Set((0L, 1L), (3L, 4L)))
  }

  test("trigram shingles separate reordered docs that unigrams conflate") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        Dedup.wordNgrams(_, 3), num = 7, den = 10, numHashes = 256, bands = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one-word-changed docs share 6/8 trigrams (0.75 >= 0.7) and stay; the
    // permuted pair (3,4) — unigram J = 1.0 — shares NO trigram and is gone
    assert(pairs === Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(!pairs.contains((3L, 4L)))
  }

  test("simhash: identical token sets agree; hamming 0 vs nonzero") {
    val sigs = docs.select($"doc_id",
        Dedup.simhashBits(Dedup.hashedShingles(TextAnalysis.tokenSet($"text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sigs(0L) === sigs(1L))
    assert(sigs(3L) === sigs(4L)) // same token set -> same simhash
    assert(sigs(0L) !== sigs(3L))
    sigs.values.foreach(s => assert(s.length === 64 && s.forall(b => b == 0 || b == 1)))
  }

  test("connectedComponents assigns the cluster-min id as canon") {
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 1-2-3 (one component), pair 5-6, singleton 4
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(vertices, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents with ZERO pairs: every vertex its own canon") {
    val vertices = Seq(1L, 2L, 3L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(vertices, "doc_id", noPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("connectedComponents handles hash-range ids (no ANSI long-sum overflow)") {
    // entity keys are often xxhash64 values near ±2^63: the convergence
    // check sums labels, and a bigint sum overflows there (ANSI failure —
    // or a silent wrap that could fake a fixpoint); the decimal(38,0)
    // accumulator must make this exact
    val a = Long.MaxValue - 1L; val b = Long.MaxValue - 3L
    val c = Long.MinValue + 5L
    val vertices = Seq(a, b, c).toDF("doc_id")
    val pairs = Seq((a, b)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(vertices, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(a -> b, b -> b, c -> c))
  }

  test("pointer jumping converges a 60-deep chain well inside the cap") {
    // worst case for plain min-label propagation: a single path graph —
    // 60 rounds without jumping, O(log 60) with; the default cap of 30
    // would abort the non-jumping algorithm (require(converged)) here
    val n = 60L
    val vertices = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(vertices, "doc_id", pairs, maxIter = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === (1L to n).map(_ -> 1L).toMap)
  }

  test("over the broadcast gate the LSH pipeline is broadcast-free and agrees") {
    val expected = Dedup.minhashNearDups(docs, "doc_id", "text",
        TextAnalysis.tokenSet, num = 9, den = 10, numHashes = 128, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // force the over-the-gate strategy, and pin Spark's own auto-broadcast
    // off to simulate the 100 TB case where the estimator also refuses
    spark.conf.set(Dedup.BroadcastThresholdKey, "0")
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dedup = Dedup.minhashNearDups(docs, "doc_id", "text",
        TextAnalysis.tokenSet, num = 9, den = 10, numHashes = 128, bands = 32)
      val plan = dedup.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"shuffle strategy must not broadcast corpus tables:\n$plan")
      val pairs = dedup.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === expected)
    } finally {
      spark.conf.unset(Dedup.BroadcastThresholdKey)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("packed simhash equals bit-array simhash; hammingPacked is XOR popcount") {
    val both = docs.select($"doc_id",
        Dedup.simhashBits(Dedup.hashedShingles(TextAnalysis.tokenSet($"text"))).as("bits"),
        Dedup.simhashPacked(Dedup.hashedShingles(TextAnalysis.tokenSet($"text"))).as("packed"))
      .collect().map(r => (r.getSeq[Int](1), r.getLong(2)))
    both.foreach { case (bits, packed) =>
      val repacked = bits.zipWithIndex.foldLeft(0L) { case (acc, (b, j)) =>
        if (b == 1) acc | (1L << j) else acc
      }
      assert(repacked === packed)
    }
    val h = Seq((0L, 0L), (0L, 7L), (-1L, 0L)).toDF("a", "b")
      .select(Dedup.hammingPacked($"a", $"b").as("h")).collect().map(_.getInt(0))
    assert(h.toSeq === Seq(0, 3, 64))
  }

  test("simhashNearDups finds exactly the all-pairs hamming<=k set (pigeonhole)") {
    val found = Dedup.simhashNearDups(docs, "doc_id", "text", TextAnalysis.tokenSet, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = docs.select($"doc_id",
        Dedup.simhashPacked(Dedup.hashedShingles(TextAnalysis.tokenSet($"text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(found === brute)
    // sanity: identical token sets => hamming 0 => present
    assert(found.contains((0L, 1L)) && found.contains((3L, 4L)))
  }

  test("novelAgainst keeps only batch docs with no corpus near-dup") {
    val corpus = docs.filter($"doc_id" <= 2) // 0, 1, 2
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of corpus 0
      (11L, "entirely novel text about distributed joins"),
      (12L, "")) // empty token set -> novel by definition
      .toDF("doc_id", "text")
    val novel = Dedup.novelAgainst(batch, corpus, "doc_id", "text",
        c => Dedup.hashedShingles(TextAnalysis.tokenSet(c)), num = 9, den = 10,
        numHashes = 128, bands = 32)
      .collect().map(_.getLong(0)).toSet
    assert(novel === Set(11L, 12L))
    // the cross pairs themselves: batch id on the left, corpus id right
    val pairs = Dedup.crossNearDupsHashed(batch, corpus, "doc_id", "text",
        c => Dedup.hashedShingles(TextAnalysis.tokenSet(c)), 9, 10, 128, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 0L), (10L, 1L)))
  }

  test("duplicateIdsStream emits exactly the batch reject list, once per doc") {
    import org.apache.spark.sql.functions.{lit, timestamp_micros}
    val corpus = docs.filter($"doc_id" <= 2)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of corpus 0 AND 1
      (11L, "entirely novel text about distributed joins"),
      (12L, ""))
      .toDF("doc_id", "text")
    val src = java.nio.file.Files.createTempDirectory("graft_dds_src").toString
    batch.coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(batch.schema).parquet(s"$src/*.parquet")
    // doc 10 collides with TWO corpus docs across MANY bands: the
    // watermarked distinct must still emit it exactly once
    val out = Dedup.duplicateIdsStream(stream, corpus, "doc_id", "text",
      c => Dedup.hashedShingles(TextAnalysis.tokenSet(c)), num = 9, den = 10,
      numHashes = 128, bands = 32,
      eventTimeCol = timestamp_micros(lit(86400000000L)))
    val q = out.writeStream.format("memory").queryName("dds_sink")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dds_sink").collect().map(_.getLong(0)).sorted.toSeq
    spark.catalog.dropTempView("dds_sink")
    assert(got === Seq(10L))
    // parity with the batch path over the same inputs
    val batchRejects = Dedup.crossNearDupsHashed(batch, corpus, "doc_id", "text",
        c => Dedup.hashedShingles(TextAnalysis.tokenSet(c)), 9, 10, 128, 32)
      .select($"id_a").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(got === batchRejects)
  }

  test("duplicateIdsStream over a parquet-persisted index: corpus text scanned exactly once") {
    import org.apache.spark.sql.functions.{lit, timestamp_micros}
    // the corpus rides through an accumulator-instrumented RDD: every text
    // row the engine reads bumps the counter, so "shingled exactly once"
    // is an assertion, not a claim — buildNearDupIndex's localCheckpoint
    // is the only pass; persisting BOTH index tables and serving two
    // micro-batches through them must not touch the corpus again
    val corpusRows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "completely different content about spark engines"))
    val scans = spark.sparkContext.longAccumulator("corpus_scans")
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(corpusRows, 1)
        .map { r => scans.add(1); r }).toDF("doc_id", "text")
    val built = Dedup.buildNearDupIndex(corpus, "doc_id", "text",
      c => Dedup.hashedShingles(TextAnalysis.tokenSet(c)), numHashes = 128, bands = 32)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ddsp").toString
    val store = new graft.sync.ParquetStore(spark, tmp)
    store.write(built.bandIndex, "band_index")
    store.write(built.shingleSets, "shingle_sets")
    val index = Dedup.NearDupIndex(
      store.read("band_index").get, store.read("shingle_sets").get)
    // arrivals split across TWO micro-batches (one file each)
    val arrivals = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of corpus 0
      (11L, "entirely novel text about distributed joins"))
      .toDF("doc_id", "text")
    val src = java.nio.file.Files.createTempDirectory("graft_ddsp_src").toString
    arrivals.filter($"doc_id" === 10L).coalesce(1).write.mode("append").parquet(src)
    arrivals.filter($"doc_id" === 11L).coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(arrivals.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val out = Dedup.duplicateIdsStream(stream, index, "doc_id", "text",
      c => Dedup.hashedShingles(TextAnalysis.tokenSet(c)), num = 9, den = 10,
      numHashes = 128, bands = 32,
      eventTimeCol = timestamp_micros(lit(86400000000L)),
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ddsp_sink")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ddsp_sink").collect().map(_.getLong(0)).sorted.toSeq
    spark.catalog.dropTempView("ddsp_sink")
    assert(got === Seq(10L))
    // THE claim under test: index build + two table writes + two served
    // micro-batches read each corpus row exactly once (the build pass)
    assert(scans.value === corpusRows.size.toLong,
      s"corpus scanned ${scans.value} row-reads for ${corpusRows.size} rows")
    // parity with the batch path over the same inputs (re-scans the corpus
    // by design — it takes the text, not the index; asserted after the
    // scan-count check so it cannot mask a persisted-path re-scan)
    val batchRejects = Dedup.crossNearDupsHashed(arrivals, corpus, "doc_id", "text",
        c => Dedup.hashedShingles(TextAnalysis.tokenSet(c)), 9, 10, 128, 32)
      .select($"id_a").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(got === batchRejects)
  }

  test("shuffle and broadcast strategies agree on the real sf0.001 corpus") {
    // the tiny-docs test pins semantics; this pins the shuffle path's plan
    // behavior on a real 500-doc self-similar corpus (band-collision volume
    // and AQE interplay a 5-row input cannot exercise), q21's parameters
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def mine() = Dedup.minhashNearDups(corpus, "doc_id", "text",
        TextAnalysis.tokenSet, num = 9, den = 10, numHashes = 125, bands = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBroadcast = mine()
    spark.conf.set(Dedup.BroadcastThresholdKey, "0")
    try assert(mine() === viaBroadcast)
    finally spark.conf.unset(Dedup.BroadcastThresholdKey)
    assert(viaBroadcast.nonEmpty) // the corpus does contain near-dups
  }

  test("verifyJaccard integer threshold: J >= num/den boundary is exact") {
    val sets = Seq(
      (1L, Seq(1L, 2L, 3L, 4L).sorted),
      (2L, Seq(1L, 2L, 3L, 4L, 5L).sorted), // J(1,2) = 4/5 = 0.8
      (3L, Seq(10L, 20L).sorted))
      .toDF("doc_id", "sh")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    def pairsAt(num: Int, den: Int) =
      Dedup.verifyJaccard(cands, sets, "doc_id", "sh", num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsAt(8, 10) === Set((1L, 2L)))   // 0.8 >= 0.8 inclusive
    assert(pairsAt(9, 10) === Set.empty)       // 0.8 < 0.9
  }

  test("keepBest keeps the highest-scoring member per cluster, id tie-break") {
    import org.apache.spark.sql.functions.col
    // clusters {1,2,3} canon 1 and {7} canon 7
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L)).toDF("id", "canon")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L)).toDF("doc_id", "quality")
    val kept = Dedup.keepBest(labels, scores, "doc_id", "quality")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept === Map(1L -> ((2L, 9L)), 7L -> ((7L, 4L)))) // 2 beats 3 on id
    // constant score degenerates to keep-min-id (the q33 decision)
    val minId = Dedup.keepBest(labels,
        scores.withColumn("quality", org.apache.spark.sql.functions.lit(1L)),
        "doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(minId === Map(1L -> 1L, 7L -> 7L))
  }

  test("packedNearDups finds exactly the all-pairs hamming<=k set over given sigs") {
    val sigs = Seq(
      (0L, 0x0000000000000000L),
      (1L, 0x0000000000000003L),  // hamming 2 from 0
      (2L, 0x000000000000000fL),  // hamming 4 from 0, 2 from 1
      (3L, 0xffffffffffffffffL),  // far from everything
      (4L, 0xfffffffffffffff0L))  // hamming 4 from 3
      .toDF("id", "sig")
    def pairs(k: Int) = Dedup.packedNearDups(sigs, "id", "sig", maxHamming = k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(3) === Set((0L, 1L), (1L, 2L)))
    assert(pairs(7) === Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
  }

  test("imageNearDups pairs near-identical renditions, not distinct images") {
    import graft.multimodal.PlantedImages.planted
    val sigA = 0x123456789abcdef0L
    val sigB = 0x0fedcba987654321L
    val media = Seq(
      (10L, planted(sigA, "png")),
      (11L, planted(sigA, "bmp")),                     // same pixels, other container
      (12L, planted(sigA ^ (1L << 5), "png")),         // one-gradient edit: hamming 1
      (20L, planted(sigB, "png")),                     // unrelated image
      (30L, "not an image".getBytes),                  // undecodable: silently out
      (40L, planted(0L, "png")),                       // featureless (dHash 0): no
      (41L, planted(0L, "bmp")),                       // evidence -> must NOT pair
      (50L, planted(-1L, "png")),                      // monotone rising fade (-1):
      (51L, planted(-1L, "bmp"))                       // the mirror, equally blind
    ).toDF("doc_id", "media")
    val got = Dedup.imageNearDups(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 11L), (10L, 12L), (11L, 12L)))
  }

  test("audioNearDups pairs re-leveled renditions, not distinct clips or silence") {
    def pcm(sig: Long, scale: Int = 1): Array[Byte] = {
      val (frames, per) = (65, 64)
      val bytes = new Array[Byte](frames * per * 2)
      var a = 1000
      for (f <- 0 until frames) {
        if (f > 0) a += (if (((sig >>> (f - 1)) & 1L) == 1L) 10 else -10)
        for (i <- 0 until per) {
          val s = (if (i % 2 == 0) a else -a) * scale
          bytes(2 * (f * per + i)) = (s & 0xff).toByte
          bytes(2 * (f * per + i) + 1) = ((s >> 8) & 0xff).toByte
        }
      }
      bytes
    }
    val sigA = 0x123456789abcdef0L
    val sigB = 0x0fedcba987654321L
    val media = Seq(
      (10L, pcm(sigA)),
      (11L, pcm(sigA, scale = 3)),            // re-leveled: same fingerprint
      (12L, pcm(sigA ^ (1L << 5))),           // one re-leveled frame: hamming 1
      (20L, pcm(sigB)),                       // unrelated clip
      (40L, new Array[Byte](65 * 64 * 2)),    // silence (hash 0): no evidence
      (41L, new Array[Byte](65 * 64 * 2)),    // -> must NOT pair
      (50L, pcm(-1L)),                        // monotone rising fade (-1):
      (51L, pcm(-1L))                         // the mirror, equally blind
    ).toDF("doc_id", "media")
    val got = Dedup.audioNearDups(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 11L), (10L, 12L), (11L, 12L)))
  }

  test("sourceOverlapMatrix: pairwise shared distinct grams with per-side totals") {
    val shared = "a b c d"                    // one shared 3-gram family
    val docs = Seq(
      ("s1", s"$shared u1 u2"),               // grams: abc,bcd,cdu1,du1u2 (4)
      ("s1", s"$shared u1 u2"),               // exact dup doc: distinct grams unchanged
      ("s2", s"$shared v1"),                  // grams: abc,bcd,cdv1 (3)
      ("s3", "w1 w2 w3 w4"))                  // disjoint: w1w2w3,w2w3w4 (2)
      .toDF("source", "text")
    val got = Dedup.sourceOverlapMatrix(docs, "source", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // only the genuinely overlapping pair emits; totals are DISTINCT grams;
    // containment shares are permille floors: 2/4 -> 500, 2/3 -> 666
    assert(got === Map(("s1", "s2") -> ((2L, 4L, 3L, 500L, 666L))))
  }

  test("lineDedup drops corpus-hot lines retroactively, preserving order") {
    val docs = Seq(
      (1L, "FOOTER\nalpha\nbeta"),
      (2L, "gamma\nFOOTER"),
      (3L, "FOOTER\ndelta\nFOOTER"),   // two occurrences in one doc both drop
      (4L, "FOOTER"),                  // fully boilerplate -> empty, survives
      (5L, null.asInstanceOf[String]), // NULL text reads as ''
      (6L, "epsilon\n\nzeta\n")        // interior blank + trailing newline kept
    ).toDF("doc_id", "text")
    // FOOTER occurs 5x (> 3); '' occurs 3x (doc 5 + doc 6's blank + trailing)
    val got = Dedup.lineDedup(docs, "doc_id", "text", maxDf = 3)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("alpha\nbeta", 2L, 1L)))
    assert(got(2L) === (("gamma", 1L, 1L)))
    assert(got(3L) === (("delta", 1L, 2L)))     // FIRST occurrence drops too
    assert(got(4L) === (("", 0L, 1L)))
    assert(got(5L) === (("", 1L, 0L)))          // the single '' line is not hot
    assert(got(6L) === (("epsilon\n\nzeta\n", 4L, 0L)))
    assert(got.size === 6)
    // threshold boundary: exactly maxDf occurrences stay
    val ok = Dedup.lineDedup(docs, "doc_id", "text", maxDf = 5)
      .filter(col("doc_id") === 3L).head
    assert(ok.getString(1) === "FOOTER\ndelta\nFOOTER")
    // PARAGRAPH mode: sep = "\n\n" dedups blank-line-delimited blocks
    // with the identical machinery; the separator is a literal, so the
    // single newlines INSIDE a paragraph never split it
    val paras = Seq(
      (1L, "BOILER\nPLATE\n\nunique one"),
      (2L, "BOILER\nPLATE\n\nunique two"),
      (3L, "BOILER\nPLATE\n\nunique three"))
      .toDF("doc_id", "text")
    val pg = Dedup.lineDedup(paras, "doc_id", "text", maxDf = 2, sep = "\n\n")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(pg === Map(1L -> (("unique one", 1L)), 2L -> (("unique two", 1L)),
      3L -> (("unique three", 1L))))
    intercept[IllegalArgumentException] {
      Dedup.lineDedup(docs, "doc_id", "text", maxDf = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.lineDedup(docs.withColumnRenamed("doc_id", "n_kept"),
        "n_kept", "text", maxDf = 3)
    }
    // the serve path (index already exploded) enforces the same guard
    intercept[IllegalArgumentException] {
      Dedup.lineDedupFromIndex(
        Dedup.lineIndexRows(docs, "doc_id", "text")
          .withColumnRenamed("doc_id", "text_clean"), "text_clean", maxDf = 3)
    }
    // the lineage-stamp names are guarded too: an idCol named __run
    // would be silently overwritten by the ingest guard's stamping
    intercept[IllegalArgumentException] {
      Dedup.lineIndexRows(docs.withColumnRenamed("doc_id", "__run"),
        "__run", "text")
    }
  }

  test("lineDedupAgainstHot: hotness comes from the pinned set, never the batch") {
    // the serving-gate property: this one-doc batch carries FOOTER once
    // (it could never cross any threshold on its own counts), but the
    // pinned snapshot says it is corpus-hot — it must drop
    val batch = Seq((7L, "FOOTER\nalpha")).toDF("doc_id", "text")
    val hot = Seq("FOOTER").toDF("line")
    val got = Dedup.lineDedupAgainstHot(
      Dedup.lineIndexRows(batch, "doc_id", "text"), hot, "doc_id").head
    assert((got.getString(1), got.getLong(2), got.getLong(3)) === (("alpha", 1L, 1L)))
    // and a line the snapshot does NOT list survives even if the batch
    // itself repeats it
    val batch2 = Seq((8L, "x\nx\nx")).toDF("doc_id", "text")
    val got2 = Dedup.lineDedupAgainstHot(
      Dedup.lineIndexRows(batch2, "doc_id", "text"), hot, "doc_id").head
    assert(got2.getString(1) === "x\nx\nx")
    // hotLines is the gate half of lineDedupFromIndex
    val idx = Dedup.lineIndexRows(Seq((1L, "a\nb"), (2L, "a")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(Dedup.hotLines(idx, maxDf = 1).collect().map(_.getString(0)).toSeq
      === Seq("a"))
  }
  test("packedDupsAgainst: cross pairs only, direction kept, self-ids excluded") {
    val batch = Seq((10L, 0x0000000000000001L), (11L, 0xffffffffffffffffL),
      (2L, 0x000000000000000fL)).toDF("id", "sig")
    val corpus = Seq((0L, 0x0000000000000000L), (1L, 0x0000000000000003L),
      (2L, 0x000000000000000fL), (3L, 0x0f0f0f0f0f0f0f0fL)).toDF("id", "sig")
    val got = Dedup.packedDupsAgainst(batch, corpus, "id", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10 is hamming 1 from 0, 2 from 1, 3 from 2 (cross, batch-first
    // direction); 2 is hamming 0 from its own index row (self — excluded)
    // and 2 from corpus 1; 11 pairs with nothing within 3
    assert(got === Set((10L, 0L), (10L, 1L), (10L, 2L), (2L, 1L)))
    // empty corpus side: no pairs, not an error
    assert(Dedup.packedDupsAgainst(batch, corpus.limit(0), "id", "sig", 3)
      .count() === 0L)
  }
}
