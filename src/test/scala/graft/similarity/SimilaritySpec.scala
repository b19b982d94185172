package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")

  test("dot and cosine on known vectors (codegen'd FloatDotProduct)") {
    val df = vecs(0L -> Seq(1f, 2f, 3f), 1L -> Seq(4f, 5f, 6f))
    val d = df.filter($"vec_id" === 0).crossJoin(
        df.filter($"vec_id" === 1).select($"embedding".as("b")))
      .select(Similarity.dot($"embedding", $"b").as("d"),
        Similarity.cosine($"embedding", $"b").as("c")).head
    assert(d.getDouble(0) === 32.0)
    assert(math.abs(d.getDouble(1) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("empty arrays dot to 0") {
    val df = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    assert(df.select(Similarity.dot($"a", $"b")).head.getDouble(0) === 0.0)
  }

  test("bruteForceTopK returns the k nearest by cosine, self excluded") {
    val df = vecs(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0f, 1f),
      3L -> Seq(1f, 0.01f), 4L -> Seq(-1f, 0f))
    val top2 = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 === Set(1L, 3L))
  }

  test("nearDupPairs finds exactly the high-cosine pairs") {
    val df = vecs(
      0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f),       // identical -> cos 1
      2L -> Seq(0f, 1f), 3L -> Seq(0.01f, 1f),    // near-identical
      4L -> Seq(1f, 1f))                           // 45 deg from both axes
    val pairs = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L), (2L, 3L)))
  }

  test("srpBucket is deterministic and identical vectors share a bucket") {
    val planes = Similarity.hyperplanes(8, 4)
    val df = vecs(0L -> Seq(1f, 2f, 3f, 4f), 1L -> Seq(1f, 2f, 3f, 4f), 2L -> Seq(-1f, -2f, -3f, -4f))
    val buckets = df.select($"vec_id", Similarity.srpBucket($"embedding", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets(0L) === buckets(1L))
    // mirrored vector flips every sign bit
    assert(buckets(2L) === (~buckets(0L) & 0xff))
  }

  test("lshNearDupPairs finds planted near-dup pairs without all-pairs compare") {
    val rnd = new scala.util.Random(11)
    val dim = 64
    // 20 base vectors, each with one tight near-dup copy + 200 random fillers
    val bases = (0 until 20).map(_ => Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val rows =
      bases.zipWithIndex.flatMap { case (v, i) =>
        val copy = v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)
        Seq((i * 2L) -> v.toSeq, (i * 2L + 1) -> copy.toSeq)
      } ++ (100L until 300L).map(i => i -> Array.fill(dim)(rnd.nextFloat() * 2 - 1).toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val expected = (0 until 20).map(i => (i * 2L, i * 2L + 1)).toSet
    val found = Similarity.lshNearDupPairs(df, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verification kills false positives; multi-table LSH recall >= 90%
    assert(found.subsetOf(expected))
    assert(found.size >= 18, s"recall ${found.size}/20 too low")
  }

  test("ivfTopK recovers planted near neighbors via probed cells") {
    val rnd = new scala.util.Random(13)
    val dim = 64
    val base = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    def jitter(eps: Float) = base.map(v => v + (rnd.nextFloat() - 0.5f) * eps)
    val rows = (0L -> base.toSeq) +: (1L to 5L).map(i => i -> jitter(0.1f).toSeq) ++:
      (6L to 205L).map(i => i -> Array.fill(dim)(rnd.nextFloat() * 2 - 1).toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val approx = Similarity.ivfTopK(df, "vec_id", "embedding", 0L, 5,
        numCentroids = 8, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx intersect Set(1L, 2L, 3L, 4L, 5L)).size / 5.0
    // tight jitter puts the cluster in one cell; probing its cell finds them
    assert(recall >= 0.8, s"IVF recall $recall too low; approx=$approx")
  }

  test("ivfCentroids is stable across invocations (seeded, near-identical)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val b = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    assert(a.map(_._1).toSeq === b.map(_._1).toSeq)
    // Lloyd sums are distributed double partial-aggregates: merge order is
    // not guaranteed, so compare approximately, not bit-exactly
    a.zip(b).foreach { case ((_, ca), (_, cb)) =>
      ca.zip(cb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-5f) }
    }
  }

  test("ivfTopK on an absent queryId returns empty, like the sibling APIs") {
    val df = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 2L -> Seq(1f, 1f))
    assert(Similarity.ivfTopK(df, "vec_id", "embedding", 999L, 2,
      numCentroids = 2, nprobe = 1).count() === 0)
  }

  test("IVF invariants: full probe == brute force; nprobe=1 finds an exact twin") {
    // iterations=0 makes centroids exactly the hash-seeded sample vectors —
    // no distributed double sums, so both checks are bit-deterministic;
    // q36 pins the same two invariants against a SELECT 0 oracle
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val corpus = emb.unionByName(
      emb.filter($"vec_id" === 0L).select(lit(1000000L).as("vec_id"), $"embedding"))
    val idx = Similarity.ivfIndex(corpus, "vec_id", "embedding", numCentroids = 16, iterations = 0)
    val full = Similarity.ivfTopK(idx, "vec_id", "embedding", 0L, 10, nprobe = 16)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(full === brute, "probing every cell must reproduce exact top-k")
    val one = Similarity.ivfTopK(idx, "vec_id", "embedding", 0L, 1, nprobe = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(one === Seq(1000000L), "the query's own cell must contain its exact twin")
  }

  test("lshNearDupPairs on exact twins finds every planted pair and nothing else") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val twins = emb.filter($"vec_id" < 50)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val corpus = emb.unionByName(twins)
    val pairs = Similarity.lshNearDupPairs(corpus, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors share every bucket in every table -> guaranteed
    // candidates; exact verify kills all non-twin pairs (max cosine ~0.5)
    assert(pairs === (0L until 50L).map(i => (i, i + 1000000L)).toSet)
  }

  test("annTopK recovers planted near neighbors (clustered data)") {
    // SRP-LSH only promises recall when neighbors are directionally CLOSE;
    // on isotropic random vectors (max pair cosine ~0.37 in the testdata)
    // every bucket is equally wrong, so the honest test plants a cluster:
    // vecs 1-5 are small perturbations of the query vector 0.
    val rnd = new scala.util.Random(7)
    val dim = 64
    val base = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    def jitter(eps: Float) = base.zipWithIndex.map { case (v, _) => v + (rnd.nextFloat() - 0.5f) * eps }
    val rows = (0L -> base.toSeq) +: (1L to 5L).map(i => i -> jitter(0.1f).toSeq) ++:
      (6L to 105L).map(i => i -> Array.fill(dim)(rnd.nextFloat() * 2 - 1).toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val approx = Similarity.annTopK(df, "vec_id", "embedding", 0L, 5)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx intersect Set(1L, 2L, 3L, 4L, 5L)).size / 5.0
    assert(recall >= 0.6, s"ANN recall $recall below floor; approx=$approx")
  }

  test("pqTrain/pqEncode: codebook shapes, code ranges, identical vectors share codes") {
    val rnd = new scala.util.Random(5)
    val dim = 16
    val rows = (0L until 40L).map(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1))) :+
      (100L, Seq.fill(dim)(0.5f)) :+ (101L, Seq.fill(dim)(0.5f))
    val df = vecs(rows: _*)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = dim, m = 4, k = 8)
    assert(cb.m === 4 && cb.subDim === 4)
    assert(cb.books.forall(b => b.length === 8 && b.map(_._1).toSeq == (0 until 8)))
    assert(cb.books.forall(_.forall(_._2.length === 4)))
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 8)))
    assert(codes(100L) === codes(101L)) // identical vectors, identical codes
  }

  test("pqTopK with a full-corpus shortlist equals brute force exactly") {
    val rnd = new scala.util.Random(6)
    val dim = 16
    val df = vecs((0L until 60L).map(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1))): _*)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = dim, m = 4, k = 8)
    val enc = Similarity.pqEncode(df, "vec_id", "embedding", cb)
    val qvec = df.filter($"vec_id" === 0).select($"embedding").head.getSeq[Float](0).toArray
    // shortlist >= corpus size -> the ADC stage prunes nothing and the
    // exact rescore tail decides everything
    val pq = Similarity.pqTopK(enc, df, cb, "vec_id", "embedding", qvec, 0L, 5, shortlist = 100)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(pq === exact)
  }

  test("pqTopK recall on clustered data with a tight shortlist") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    // 6 well-separated cluster centers, 30 members each with small jitter
    val centers = (0 until 6).map(_ => Array.fill(dim)(rnd.nextFloat() * 8 - 4))
    val rows = for (c <- centers.indices; j <- 0 until 30) yield
      (c * 100L + j, centers(c).toSeq.map(x => x + rnd.nextFloat() * 0.2f - 0.1f))
    val df = vecs(rows: _*)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = dim, m = 4, k = 16)
    val enc = Similarity.pqEncode(df, "vec_id", "embedding", cb)
    val qvec = df.filter($"vec_id" === 0).select($"embedding").head.getSeq[Float](0).toArray
    val pq = Similarity.pqTopK(enc, df, cb, "vec_id", "embedding", qvec, 0L, 10, shortlist = 40)
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    // the 29 same-cluster siblings dominate both lists
    assert((pq intersect exact).size >= 8, s"recall too low: ${(pq intersect exact).size}/10")
  }

  test("ivfPqTopK with full probe and full shortlist equals brute force") {
    val rnd = new scala.util.Random(8)
    val dim = 16
    val df = vecs((0L until 80L).map(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1))): _*)
    val index = Similarity.ivfIndex(df, "vec_id", "embedding", numCentroids = 4, iterations = 0)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = dim, m = 4, k = 8)
    val enc = Similarity.pqEncode(df, "vec_id", "embedding", cb)
    // nprobe = all cells and shortlist >= corpus: both funnels pass
    // everything through and the exact rescore tail decides alone
    val pq = Similarity.ivfPqTopK(index, enc, df, cb, "vec_id", "embedding",
        0L, 5, nprobe = 4, shortlist = 200)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(pq === exact)
  }

  test("ivfPqTopK on an absent queryId returns empty, like the sibling APIs") {
    val df = vecs(0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f))
    val index = Similarity.ivfIndex(df, "vec_id", "embedding", numCentroids = 2, iterations = 0)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 4, m = 2, k = 2)
    val enc = Similarity.pqEncode(df, "vec_id", "embedding", cb)
    assert(Similarity.ivfPqTopK(index, enc, df, cb, "vec_id", "embedding",
      999L, 5, nprobe = 2).count() === 0)
  }

  test("semanticDedup drops identical twins, keeps originals and unrelated") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f), 10L -> Seq(1f, 0f, 0f),   // twin of 0 -> dropped
      1L -> Seq(0f, 1f, 0f), 11L -> Seq(0f, 1f, 0f),   // twin of 1 -> dropped
      2L -> Seq(0f, 0f, 1f))                            // unrelated -> kept
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      numCentroids = 2, threshold = 0.95).collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L, 2L))
  }

  test("semanticDedup chain a~b~c removes BOTH b and c (epsilon-ball, not CC keep-one)") {
    // b at 16 deg from a (cos .961 >= .95), c at 32 deg (cos to a .848 < .95,
    // cos to b .961): b is anchored out by a, c by b — even though b itself
    // was removed, the anchor rule looks at the ORIGINAL set
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val df = vecs(0L -> at(0), 1L -> at(16), 2L -> at(32))
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      numCentroids = 1, threshold = 0.95).collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L))
  }

  test("a NaN vector cannot poison k-means centroids") {
    val df = vecs(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f),
      2L -> Seq(0f, 1f), 3L -> Seq(0.1f, 0.9f),
      4L -> Seq(Float.NaN, 1f))
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", k = 2, iterations = 2)
    assert(cents.forall(_._2.forall(v => !v.isNaN)),
      s"Lloyd means must exclude non-finite vectors: ${cents.map(_._2.toSeq).toSeq}")
  }

  test("semanticDedup rankCol: the BEST-ranked twin survives, not the lowest id") {
    val df = Seq(
      (0L, Seq(1f, 0f), 5L),   // twin pair: id 1 has the better (lower) rank
      (1L, Seq(1f, 0f), 2L),
      (2L, Seq(0f, 1f), 9L))   // unrelated
      .toDF("vec_id", "embedding", "quality_rank")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      numCentroids = 1, threshold = 0.95, rankCol = Some("quality_rank"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
  }

  test("zero-norm vectors never pair and never anchor removals") {
    val df = vecs(
      0L -> Seq(0f, 0f),    // failed embed: must not pair with anything
      1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f),  // real twin pair
      3L -> Seq(0f, 1f),
      4L -> Seq(Float.NaN, 1f))  // NaN norm compares GREATER than 0 — must also be dropped
    assert(Similarity.nearDupPairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(Similarity.lshNearDupPairs(df, "vec_id", "embedding", 0.9, dim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    // the zero/NaN vectors themselves SURVIVE dedup (they anchor nothing,
    // match nothing); only the later twin is removed
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      numCentroids = 1, threshold = 0.9).collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L, 3L, 4L))
  }

  test("semanticDedup preserves all original columns on survivors") {
    val df = Seq((0L, Seq(1f, 0f), "keep-me"), (1L, Seq(1f, 0f), "dropped"))
      .toDF("vec_id", "embedding", "tag")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      numCentroids = 1, threshold = 0.95).collect()
    assert(kept.length === 1)
    assert(kept.head.getAs[String]("tag") === "keep-me")
  }

  test("knnJoin matches per-query bruteForceTopK; non-finite queries drop") {
    val corpus = vecs(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0f, 1f),
      3L -> Seq(0.2f, 0.8f), 4L -> Seq(0.7f, 0.3f), 5L -> Seq(Float.NaN, 1f))
    val queries = vecs(0L -> Seq(1f, 0f), 2L -> Seq(0f, 1f),
      9L -> Seq(Float.NaN, 0f)) // failed embed: contributes no output rows
    val got = Similarity.knnJoin(queries, corpus, "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Seq(0L, 2L).flatMap { qid =>
      Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qid, 2)
        .collect().map(r => (qid, r.getLong(0)))
    }.toSet
    assert(got === want)
    assert(!got.exists(_._1 == 9L))
  }

  test("knnJoinIvf at full probe equals knnJoin; partial probe finds a planted twin") {
    val rows = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Seq(1f, 0f, 0.1f * (i % 5)) else Seq(0f, 1f, 0.1f * (i % 5))
      (i, base)
    } :+ (99L -> Seq(1f, 0f, 0.2f)) // exact twin of vec 2's direction family
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 4)
    val index = Similarity.ivfIndex(df, "vec_id", "embedding", numCentroids = 4)
    val exact = Similarity.knnJoin(queries, df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.knnJoinIvf(index, queries, "vec_id", "embedding", 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
    // partial probe: rows 12/22/32/99 are EXACT copies of query 2's vector
    // (cosine 1), so they share its cell and the top-3 must be precisely
    // the three smallest-id twins (99 ties and loses the id tie-break) —
    // pinning both the own-cell-probed property and tie determinism
    val partial = Similarity.knnJoinIvf(index, queries, "vec_id", "embedding", 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(partial.filter(_._1 == 2L).map(_._2).toSet === Set(12L, 22L, 32L),
      s"exact twins must fill query 2's own-cell top-3: ${partial.toSeq}")
    assert(partial.forall { case (q, n) => q != n })
  }

  test("knnJoinPq at full shortlist equals knnJoin; tight shortlist keeps a twin") {
    // 4-dim corpus in two direction families + an exact twin of query 1
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, Seq(1f, 0.1f * (i % 7), 0f, 0.05f * (i % 3)))
      else (i, Seq(0f, 0.05f * (i % 3), 1f, 0.1f * (i % 7)))
    } :+ (99L -> Seq(0f, 0.05f, 1f, 0.1f)) // exact copy of vec 1
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 4)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 4, m = 2, k = 8)
    val encoded = Similarity.pqEncode(df, "vec_id", "embedding", cb)
    val exact = Similarity.knnJoin(queries, df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.knnJoinPq(encoded, df, cb, queries, "vec_id", "embedding",
        k = 3, shortlist = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
    // tight shortlist: 99 has IDENTICAL codes to query 1 (same vector), so
    // its ADC score ties query 1's own quantization at the maximum — the
    // shortlist must retain it and the exact rescore must rank it top-3
    val tight = Similarity.knnJoinPq(encoded, df, cb, queries, "vec_id", "embedding",
        k = 3, shortlist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tight.filter(_._1 == 1L).map(_._2).contains(99L),
      s"twin 99 must survive the ADC shortlist for query 1: ${tight.toSeq}")
    assert(tight.count(_._1 == 1L) === 3)
    assert(tight.forall { case (q, n) => q != n })
  }

  test("knnJoinIvfPq at full probe + full shortlist equals knnJoin") {
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, Seq(1f, 0.1f * (i % 7), 0f, 0.05f * (i % 3)))
      else (i, Seq(0f, 0.05f * (i % 3), 1f, 0.1f * (i % 7)))
    } :+ (99L -> Seq(0f, 0.05f, 1f, 0.1f)) // exact copy of vec 1
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 4)
    val index = Similarity.ivfIndex(df, "vec_id", "embedding", numCentroids = 4)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 4, m = 2, k = 8)
    val encoded = Similarity.pqEncode(df, "vec_id", "embedding", cb)
    val exact = Similarity.knnJoin(queries, df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.knnJoinIvfPq(index, encoded, df, cb, queries,
        "vec_id", "embedding", k = 3, nprobe = 4, shortlist = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
    // tight funnel: own-cell probe + small shortlist must still surface the
    // planted twin of query 1 (same cell, identical codes -> maximal ADC)
    val tight = Similarity.knnJoinIvfPq(index, encoded, df, cb, queries,
        "vec_id", "embedding", k = 3, nprobe = 1, shortlist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tight.filter(_._1 == 1L).map(_._2).contains(99L),
      s"twin 99 must survive the IVF-PQ funnel for query 1: ${tight.toSeq}")
    assert(tight.forall { case (q, n) => q != n })
  }

  test("sqTrain/sqEncode: codes in range, reconstruction within half a step, constant dim exact") {
    val rows = Seq(
      0L -> Seq(0f, -1f, 5f), 1L -> Seq(1f, 1f, 5f), 2L -> Seq(0.5f, 0f, 5f))
    val df = rows.toDF("vec_id", "embedding")
    val p = Similarity.sqTrain(df, "embedding", dim = 3)
    assert(p.mins.toSeq === Seq(0f, -1f, 5f))
    assert(p.scales(2) === 0f) // constant dimension trains scale 0
    val codes = Similarity.sqEncode(df, "vec_id", "embedding", p)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)))
    // constant dimension always encodes to 0 and reconstructs exactly
    assert(codes.values.forall(_(2) == 0))
    // reconstruction error bounded by half a quantization step per dim
    for ((id, v) <- rows; d <- 0 until 3) {
      val rec = p.mins(d) + codes(id)(d) * p.scales(d)
      val tol = if (p.scales(d) == 0f) 1e-6 else p.scales(d) / 2 + 1e-6
      assert(math.abs(rec - v(d)) <= tol, s"id=$id d=$d rec=$rec v=${v(d)}")
    }
  }

  test("knnJoinSq at full shortlist equals knnJoin; tight shortlist keeps a twin") {
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, Seq(1f, 0.1f * (i % 7), 0f, 0.05f * (i % 3)))
      else (i, Seq(0f, 0.05f * (i % 3), 1f, 0.1f * (i % 7)))
    } :+ (99L -> Seq(0f, 0.05f, 1f, 0.1f)) // exact copy of vec 1
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 4)
    val p = Similarity.sqTrain(df, "embedding", dim = 4)
    val encoded = Similarity.sqEncode(df, "vec_id", "embedding", p)
    val exact = Similarity.knnJoin(queries, df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.knnJoinSq(encoded, df, p, queries, "vec_id", "embedding",
        k = 3, shortlist = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
    // tight shortlist: 99 has IDENTICAL codes to query 1 (same vector), so
    // its dequantized score ties query 1's own quantization at the maximum
    val tight = Similarity.knnJoinSq(encoded, df, p, queries, "vec_id", "embedding",
        k = 3, shortlist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tight.filter(_._1 == 1L).map(_._2).contains(99L),
      s"twin 99 must survive the SQ shortlist for query 1: ${tight.toSeq}")
    assert(tight.count(_._1 == 1L) === 3)
    assert(tight.forall { case (q, n) => q != n })
  }

  test("doubleDot matches hand math and throws on ragged dims") {
    import graft.functions.VectorFunctions.doubleDot
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(doubleDot($"a", $"b")).head.getDouble(0) === 32.0)
    val ragged = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception](ragged.select(doubleDot($"a", $"b")).collect())
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("hardNegatives ranks cross-label rows only; twins and positives never surface") {
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f), 0),     // the query
      (1L, Seq(1f, 0f, 0f), 1),     // CROSS-LABEL TWIN (cos 1.0) -> ceiling drops it
      (2L, Seq(0.9f, 0.1f, 0f), 0), // same label -> never a negative
      (3L, Seq(0.8f, 0.6f, 0f), 1), // hard negative (closest legal)
      (4L, Seq(0.2f, 1f, 0f), 1),   // medium negative
      (5L, Seq(-1f, 0f, 0f), 2),    // far negative
      (6L, Seq(0f, 0f, 1f), 1))     // orthogonal negative
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df.filter($"vec_id" === 0L), df,
        "vec_id", "embedding", "label", k = 3, nearDupCeiling = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // ranked by cosine among legal negatives: 3 (0.8) > 4 (~0.196) > 6 (0)
    assert(got.toSeq === Seq((0L, 3L), (0L, 4L), (0L, 6L)))
  }

  test("miningTriplets picks top positive and top legal negative; one-sided anchors drop") {
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f), 0),      // anchor
      (1L, Seq(0.9f, 0.44f, 0f), 0), // the positive (same label, closest)
      (2L, Seq(0f, 1f, 0f), 0),      // same label, farther
      (3L, Seq(1f, 0f, 0f), 1),      // cross-label twin -> ceiling blocks
      (4L, Seq(0.8f, 0.6f, 0f), 1),  // the negative
      (5L, Seq(5f, 0f, 0f), 2),      // anchor with NO same-label peer
      (6L, Seq(0f, 0f, 1f), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.miningTriplets(df.filter($"vec_id" === 0L || $"vec_id" === 5L),
        df, "vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // anchor 5 has no positive -> no triplet; anchor 0 -> (1, 4)
    assert(got.toSeq === Seq((0L, 1L, 4L)))
  }

  test("property: miningTriplets equals brute force on seeded random data") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val data = (0L until 60L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1), (i % 5).toInt))
    val df = data.map { case (i, v, l) => (i, v.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.miningTriplets(df.filter($"vec_id" < 20), df,
        "vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (0L until 20L).flatMap { a =>
      val (_, av, al) = data(a.toInt)
      def top1(p: ((Long, Array[Float], Int)) => Boolean): Option[Long] =
        data.filter(r => r._1 != a && p(r))
          .sortBy(r => (-cos(av, r._2), r._1)).headOption.map(_._1)
      val pos = top1(_._3 == al)
      val neg = top1(r => r._3 != al && cos(av, r._2) < 0.95)
      (pos, neg) match { case (Some(p), Some(n)) => Some((a, p, n)); case _ => None }
    }.sorted
    assert(got.toSeq === want)
  }

  test("centroidAudit: string labels audit; NaN rows drop instead of poisoning a centroid") {
    val rows = Seq(
      (0L, Seq(1f, 0f), "ham"), (1L, Seq(0.9f, 0.1f), "ham"),
      (2L, Seq(0f, 1f), "spam"), (3L, Seq(0.1f, 0.9f), "spam"),
      (10L, Seq(Float.NaN, 1f), "ham"), // would poison ham's mean if kept
      (11L, Seq(0.05f, 1f), "ham"))     // spam geometry under ham: the flag
    val df = rows.toDF("vec_id", "embedding", "label")
    val audit = Similarity.centroidAudit(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(!audit.contains(10L)) // unusable embedding: out of the audit
    assert(audit(11L) === (("ham", "spam")))
    assert(audit(0L) === (("ham", "ham")) && audit(2L) === (("spam", "spam")))
    // unsupported label types fail fast, not silently merge-then-crash
    val bad = rows.map { case (i, v, _) => (i, v, 1.5) }.toDF("vec_id", "embedding", "label")
    val e = intercept[RuntimeException](
      Similarity.centroidAudit(bad, "vec_id", "embedding", "label"))
    assert(e.getMessage.contains("integral or string"))
  }

  test("hardNegatives and miningTriplets reject a ceiling above cosine's max") {
    val df = Seq((0L, Seq(1f, 0f), 0), (1L, Seq(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException](
      Similarity.hardNegatives(df, df, "vec_id", "embedding", "label", 1, nearDupCeiling = 1.5))
    intercept[IllegalArgumentException](
      Similarity.miningTriplets(df, df, "vec_id", "embedding", "label", nearDupCeiling = 95))
  }

  test("centroidAudit flags exactly the planted mislabel") {
    // two tight planted clusters; row 10 carries cluster-1 geometry under
    // label 0 — the only row whose nearest centroid disagrees
    val rows =
      (0L until 10L).map(i => (i, Seq(1f, 0.01f * i, 0f), 0)) ++
      (20L until 30L).map(i => (i, Seq(0f, 0.01f * i, 1f), 1)) :+
      ((10L, Seq(0f, 0.05f, 1f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val audit = Similarity.centroidAudit(df, "vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val flagged = audit.filter { case (_, l, c) => l != c }
    assert(flagged.toSeq === Seq((10L, 0L, 1L)))
    assert(audit.length === rows.length)
  }

  test("reassign re-routes an index to new centroids identically to a fresh build") {
    val rnd = new scala.util.Random(47)
    val rows = (0L until 60L).map { i =>
      val c = (i % 3).toInt
      (i, Array.tabulate(4)(d => (if (d == c) 5f else 0f) + rnd.nextFloat() * 0.2f).toSeq)
    }
    val emb = rows.toDF("vec_id", "vec")
    val old = Similarity.ivfIndex(emb, "vec_id", "vec", numCentroids = 6)
    val newCents = Similarity.ivfCentroids(emb, "vec_id", "vec", k = 3)
    val re = Similarity.reassign(old, "vec", newCents)
    assert(re.cents eq newCents)
    val got = re.assigned.select("vec_id", "__centroid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val fresh = Similarity.indexRows(emb, "vec", newCents)
      .select("vec_id", "__centroid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === fresh)
    assert(got.size === rows.size)
    // the stale __centroid column really was re-derived: the old 6-cell
    // routing cannot all coincide with the new 3-cell routing
    val oldRoute = old.assigned.select("vec_id", "__centroid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(oldRoute !== got)
    // reassigned rows still serve knnJoinIvf (the full-probe == exact pin)
    val q = emb.filter($"vec_id" < 3)
    val served = Similarity.knnJoinIvf(re, q, "vec_id", "vec", k = 2, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.knnJoin(q, emb, "vec_id", "vec", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served === exact)
  }
  test("mmrRerank: diversity displaces a redundant runner-up; ties and caps deterministic") {
    // query q = (1, 0). Candidates must NOT sit on the query direction
    // (for a candidate equal to the query, sim-to-it equals relevance and
    // every MMR value ties at 0): a = (1, .05) rel ~.99875; b = (1, .06)
    // a's near-twin (cos(a, b) ~ .99995 -> MMR ~ -0.87e6 at lambda .5);
    // c = (1, -.5) rel ~.894 but diverse from a (cos ~ .871 -> MMR ~
    // +11.7e6). Pure relevance ranks a, b, c; MMR must select a, c, b
    val emb = Seq(
      (1L, Array(1f, 0f)),           // the query
      (10L, Array(1f, 0.05f)),       // a: top relevance
      (11L, Array(1f, 0.06f)),       // b: a's near-twin
      (12L, Array(1f, -0.5f)))       // c: relevant but diverse
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb.filter($"vec_id" === 1L), emb,
        "vec_id", "embedding", k = 3, shortlist = 3, lambdaPermille = 500)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === Seq((1L, 10L), (2L, 12L), (3L, 11L)))
    // lambda = 1000 is pure relevance: a, b, c
    val rel = Similarity.mmrRerank(emb.filter($"vec_id" === 1L), emb,
        "vec_id", "embedding", k = 3, shortlist = 3, lambdaPermille = 1000)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rel === Seq((1L, 10L), (2L, 11L), (3L, 12L)))
    // k caps at the shortlist hit count; invalid knobs fail fast
    assert(Similarity.mmrRerank(emb.filter($"vec_id" === 1L), emb,
      "vec_id", "embedding", k = 3, shortlist = 3, lambdaPermille = 500)
      .count() === 3L)
    intercept[IllegalArgumentException](Similarity.mmrRerank(
      emb, emb, "vec_id", "embedding", k = 5, shortlist = 3, lambdaPermille = 500))
    intercept[IllegalArgumentException](Similarity.mmrRerank(
      emb, emb, "vec_id", "embedding", k = 1, shortlist = 3, lambdaPermille = 1500))
  }

  test("bitextMine: mutual-best pairs, the ratio-margin arithmetic, colliding id spaces") {
    // two 2-D 'languages' with aligned axes; ids deliberately COLLIDE
    // across corpora (independent numbering) and a zero vector rides
    // along to exercise the finite-norm drop
    val a = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 1f)), (9L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val b = Seq((1L, Array(0.99f, 0.1f)), (2L, Array(0.1f, 0.99f)),
      (3L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val mined = Similarity.bitextMine(a, b, "vec_id", "embedding",
      k = 2, marginMicros = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(mined.keySet === Set((1L, 1L), (2L, 2L), (3L, 3L)))
    // the margin definition, replayed in plain scala: cos relative to
    // the mean of both ends' top-2 neighborhoods
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val d = (x, y).zipped.map(_.toDouble * _.toDouble).sum
      d / (math.sqrt(x.map(v => v.toDouble * v).sum) *
        math.sqrt(y.map(v => v.toDouble * v).sum))
    }
    val av = Map(1L -> Array(1f, 0f), 2L -> Array(0f, 1f), 3L -> Array(1f, 1f))
    val bv = Map(1L -> Array(0.99f, 0.1f), 2L -> Array(0.1f, 0.99f), 3L -> Array(0.6f, 0.8f))
    def favg(s: Long) = bv.values.map(cos(av(s), _)).toSeq.sorted.reverse.take(2).sum / 2
    def bavg(t: Long) = av.values.map(cos(_, bv(t))).toSeq.sorted.reverse.take(2).sum / 2
    for (((s, t), m) <- mined)
      assert(math.abs(m - 2 * cos(av(s), bv(t)) / (favg(s) + bavg(t))) < 1e-5,
        s"margin mismatch for ($s,$t)")
    // an impossible threshold mines nothing
    assert(Similarity.bitextMine(a, b, "vec_id", "embedding",
      k = 2, marginMicros = 2000000L).count() === 0)
    // a margin between (2,2)'s 1.117 and (1,1)'s 1.183 gates precisely
    assert(Similarity.bitextMine(a, b, "vec_id", "embedding",
      k = 2, marginMicros = 1150000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 1L)))
    // degenerate neighborhoods mine NOTHING: an orthogonal-only pair's
    // margin is 0/0 (NaN orders above every number in Spark — it must
    // not sail past the threshold), an anti-parallel pair's denominator
    // is negative (the ratio sign-flips) — neither carries signal
    val orth = Similarity.bitextMine(
      Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding"),
      Seq((1L, Array(0f, 1f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 1, marginMicros = 0L)
    assert(orth.count() === 0)
    val anti = Similarity.bitextMine(
      Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding"),
      Seq((1L, Array(-1f, 0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 1, marginMicros = 1000000L)
    assert(anti.count() === 0)
  }
}
