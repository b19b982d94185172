package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 1000L).map(i => (i, s"s${i % 7}")).toDF("id", "src")

  test("hashSplit: ~80/20, disjoint, exhaustive, and STABLE under growth") {
    val split = Sampling.hashSplit(docs, "id", 80)
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") + counts("test") === 1000)
    assert(math.abs(counts("train") - 800) <= 50, s"train=${counts("train")}")
    // growth stability: splitting a LARGER corpus must not move old rows
    val grown = (1L to 2000L).map(i => (i, s"s${i % 7}")).toDF("id", "src")
    val before = split.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val after = Sampling.hashSplit(grown, "id", 80)
      .filter($"id" <= 1000).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before === after)
  }

  test("capPerKey keeps exactly min(n, group size) rows, chosen by the order") {
    val capped = Sampling.capPerKey(docs, Seq("src"), Seq(col("id").asc), 3)
    val byKey = capped.groupBy("src").agg(count(lit(1)).as("n"),
        collect_list("id").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](2).sorted).toMap
    assert(byKey.values.forall(_.size === 3))
    // s1 holds ids 1, 8, 15, ... -> the 3 smallest survive
    assert(byKey("s1") === Seq(1L, 8L, 15L))
    val tiny = Seq((1L, "only")).toDF("id", "src")
    assert(Sampling.capPerKey(tiny, Seq("src"), Seq(col("id")), 3).count() === 1)
  }

  test("mixtureSample: rate 1 keeps all, rate 0 keeps none, per-source rates apply") {
    import org.apache.spark.sql.functions.col
    val docs = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    val out = Sampling.mixtureSample(docs, "id", "src", Map("a" -> 1.0, "b" -> 0.0))
    val srcs = out.select("src").distinct().collect().map(_.getString(0)).toSet
    assert(srcs === Set("a"))
    assert(out.count() === 200L)
    // default rate applies to unlisted sources, roughly proportionally
    val half = Sampling.mixtureSample(docs, "id", "src", Map.empty, defaultRate = 0.5).count()
    assert(half > 120L && half < 280L, s"~50% of 400 expected, got $half")
  }

  test("mixtureSample nests exactly: lower rate is a subset of higher rate") {
    val docs = (0L until 500L).map(i => (i, "x")).toDF("id", "src")
    val lo = Sampling.mixtureSample(docs, "id", "src", Map.empty, defaultRate = 0.2)
    val hi = Sampling.mixtureSample(docs, "id", "src", Map.empty, defaultRate = 0.6)
    assert(lo.join(hi, Seq("id"), "left_anti").count() === 0L)
  }

  test("mixtureSample membership is stable under corpus growth") {
    val small = (0L until 100L).map(i => (i, "x")).toDF("id", "src")
    val grown = (0L until 1000L).map(i => (i, "x")).toDF("id", "src")
    val keptSmall = Sampling.mixtureSample(small, "id", "src", Map.empty, 0.5)
      .collect().map(_.getLong(0)).toSet
    val keptGrown = Sampling.mixtureSample(grown, "id", "src", Map.empty, 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(keptSmall === keptGrown.filter(_ < 100L))
  }

  test("mixtureSample rejects rates outside [0,1]") {
    val docs = Seq((1L, "x")).toDF("id", "src")
    val e = intercept[IllegalArgumentException](
      Sampling.mixtureSample(docs, "id", "src", Map("x" -> 1.5)))
    assert(e.getMessage.contains("rates"))
  }

  test("strataSample: ntile strata cover the order, remainder to early strata") {
    // 10 rows into 4 strata: SQL ntile gives sizes 3,3,2,2 by the order
    val df = (1L to 10L).map(i => (i, i * 100L)).toDF("id", "len")
    val strata = Sampling.strataSample(df, Seq(col("len"), col("id")), 4, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(strata === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L,
      6L -> 2L, 7L -> 3L, 8L -> 3L, 9L -> 4L, 10L -> 4L))
  }

  test("strataSample caps per stratum by the same order") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "len")
    val out = Sampling.strataSample(df, Seq(col("len"), col("id")), 4, 5)
    val byStratum = out.collect().map(r => r.getLong(2) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // each quartile is 25 wide; the cap keeps its FIRST 5 ids
    assert(byStratum === Map(
      1L -> (1L to 5L), 2L -> (26L to 30L), 3L -> (51L to 55L), 4L -> (76L to 80L)))
  }

  test("strataSample bucketed path is row-identical to the window form") {
    // the bucket-decomposed exact rank + integer ntile/start formulas must
    // reproduce SQL ntile membership AND the per-stratum cap bit-exactly,
    // across remainder shapes (n mod k != 0), n < k, and a skewed bucket
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for ((n, k, cap) <- Seq((10, 4, 10), (100, 4, 5), (3, 7, 2), (97, 5, 3))) {
      // len div 300 is order-consistent with (len, id) and skewed: low ids
      // crowd one bucket, so bucket boundaries cut strata mid-range
      val df = (1L to n.toLong).map(i => (i, i * 100L)).toDF("id", "len")
      val window = Sampling.strataSample(df, Seq(col("len"), col("id")), k, cap)
      val bucketed = Sampling.strataSample(df, Seq(col("len"), col("id")), k, cap,
        bucket = Some(expr("len div 300")))
      assert(rows(bucketed) === rows(window), s"n=$n k=$k cap=$cap")
    }
  }

  test("property: bucketed strataSample equals an independent SQL-ntile reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 60)
      k <- Gen.choose(1, 9)
      cap <- Gen.choose(1, 8)
      w <- Gen.choose(1, 200)
      lens <- Gen.listOfN(n, Gen.choose(0L, 300L))
    } yield (lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }, k, cap, w)
    val prop = Prop.forAll(gen) { case (rows, k, cap, w) =>
      val got = Sampling.strataSample(rows.toDF("id", "len"),
          Seq(col("len"), col("id")), k, cap,
          bucket = Some(expr(s"len div $w")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // independent reference: SQL ntile's explicit group sizes (first
      // n mod k groups get one extra row) over the sorted total order,
      // then the per-stratum cap — no shared formula with the operator
      val sorted = rows.sortBy(t => (t._2, t._1))
      val (q, rem) = (sorted.length / k, sorted.length % k)
      val sizes = Seq.fill(rem)(q + 1) ++ Seq.fill(k - rem)(q)
      var idx = 0
      val want = sizes.zipWithIndex.flatMap { case (sz, t) =>
        val grp = sorted.slice(idx, idx + sz); idx += sz
        grp.take(cap).map { case (id, len) => (id, len, (t + 1).toLong) }
      }.toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("exactQuantiles: ceil(p*n) discrete semantics, ties and boundary probs exact") {
    // heavy ties: value 10 x6, 20 x3, 30 x1 (n = 10)
    val df = ((1L to 6L).map((_, 10L)) ++ (7L to 9L).map((_, 20L)) ++ Seq((10L, 30L)))
      .toDF("id", "v")
    val got = Sampling.exactQuantiles(df, "v", "id", expr("v div 7"),
        Seq(0L, 100L, 500L, 600L, 601L, 900L, 1000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rank targets: ceil(p*10) clamped >= 1 -> 1,1,5,6,7,9,10
    assert(got === Map(0L -> 10L, 100L -> 10L, 500L -> 10L, 600L -> 10L,
      601L -> 20L, 900L -> 20L, 1000L -> 30L))
    // out-of-range probs are rejected
    val e = intercept[IllegalArgumentException](
      Sampling.exactQuantiles(df, "v", "id", expr("v"), Seq(1001L)))
    assert(e.getMessage.contains("permille"))
  }

  test("tokenBudgetSample: inclusive running total, never overshoots, no partial rows") {
    val df = Seq(
      ("a", 1L, 40L), ("a", 2L, 50L), ("a", 3L, 20L), ("a", 4L, 5L),
      ("b", 1L, 200L),                   // first row already over budget
      ("c", 1L, 100L), ("c", 2L, 1L))    // exactly at budget, then over
    .toDF("src", "id", "w")
    val kept = Sampling.tokenBudgetSample(df, Seq("src"), Seq(col("id")), "w", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a: 40+50=90 <= 100, +20 would be 110 -> 3 dropped; 4 also dropped
    // even though 90+5 <= 100 (prefix rule: the ORDER decides, not best-fit)
    assert(kept === Set(("a", 1L), ("a", 2L), ("c", 1L)))
  }

  test("property: tokenBudgetSample equals the per-key prefix scan") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowsGen = Gen.listOf(Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 50L)))
      .map(_.zipWithIndex.map { case ((k, w), i) => (k, i.toLong, w) })
    val prop = Prop.forAll(rowsGen, Gen.choose(1L, 120L)) { (rows, budget) =>
      rows.isEmpty || {
        val got = Sampling.tokenBudgetSample(rows.toDF("src", "id", "w"),
            Seq("src"), Seq(col("id")), "w", budget)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        val want = rows.groupBy(_._1).values.flatMap { rs =>
          rs.sortBy(_._2).scanLeft(("", -1L, 0L)) { case ((_, _, cum), (k, id, w)) =>
            (k, id, cum + w)
          }.drop(1).takeWhile(_._3 <= budget).map(r => (r._1, r._2))
        }.toSet
        got == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("tokenBudgetSample: the bucket-decomposed path equals the window path") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 300L).map(i =>
      (if (i % 7 < 5) "big" else "small", i, rnd.nextInt(40).toLong))
    val df = rows.toDF("src", "id", "w")
    def keyOf(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))
    val plain = Sampling.tokenBudgetSample(df, Seq("src"), Seq(col("id")),
        "w", 900L).collect().map(keyOf).toSet
    val bucketed = Sampling.tokenBudgetSample(df, Seq("src"), Seq(col("id")),
        "w", 900L, bucket = Some(expr("id div 16"))).collect().map(keyOf).toSet
    assert(bucketed === plain)
    assert(plain.nonEmpty && plain.size < rows.size) // the budget actually cuts
  }

  test("shardedShuffle: ranks are the exact global md5 order, a bijection, " +
       "layout-stable, and the ranking window is per-bucket (never global)") {
    val ids = (1L to 500L).toDF("id")
    val out = Sampling.shardedShuffle(ids, "id", "spec", rowsPerShard = 32L)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bijection onto [0, n)
    assert(rows.map(_._2).sorted === (0L until 500L).toArray)
    // shard/pos derive from the rank by integer div/mod
    assert(rows.forall { case (_, g, s, p) => s == g / 32 && p == g % 32 })
    // the rank IS the naive serial formulation's rank (per-bucket windows +
    // offsets stitch back to the exact global order)
    val naive = ids
      .withColumn("__k", md5(concat(lit("spec:"), $"id".cast("string")).cast("binary")))
      .withColumn("g", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"__k", $"id")) - 1).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.forall { case (id, g, _, _) => naive(id) == g })
    // partition-layout independence: same permutation from a skewed layout
    val re = Sampling.shardedShuffle(ids.repartition(3, $"id" % 2), "id", "spec", 32L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall { case (id, g, _, _) => re(id) == g })
    // seed changes the permutation (not just a relabel of shards)
    val other = Sampling.shardedShuffle(ids, "id", "other-seed", 32L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.exists { case (id, g, _, _) => other(id) != g })
    // plan shape: the corpus-sized window partitions by the bucket column;
    // the only empty-partition-spec window is the 256-row offset prefix sum
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__b"),
      s"expected per-bucket ranking window in:\n$plan")
    // both consumers (bucket counts + ranking window) share ONE exchange
    // of the keyed input — the upstream plan is scanned once, not twice
    assert(plan.contains("ReusedExchange"),
      s"expected the bucket exchange to be reused across branches in:\n$plan")
  }

  test("curriculumShuffle: priority-major exact order, md5-shuffled within tier") {
    val rows = (1L to 300L).map(i => (i, (i % 3).toInt)).toDF("id", "tier")
    val out = Sampling.curriculumShuffle(rows, "id", "tier", "spec", rowsPerShard = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // bijection onto [0, n)
    assert(out.map(_._3).sorted === (0L until 300L).toArray)
    // priority-major: every tier-0 rank precedes every tier-1 rank, etc.
    val maxByTier = out.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val minByTier = out.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    assert(maxByTier(0L) < minByTier(1L) && maxByTier(1L) < minByTier(2L))
    // within a tier the order is the naive (md5, id) serial rank
    val naive = rows
      .withColumn("__k", md5(concat(lit("spec:"), $"id".cast("string")).cast("binary")))
      .withColumn("g", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"tier", $"__k", $"id")) - 1).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.forall { case (id, _, g, _, _) => naive(id) == g })
    // shard/pos derive from the rank
    assert(out.forall { case (_, _, g, s, p) => s == g / 16 && p == g % 16 })
    // out-of-range tiers are ERRORS, never silently corrupted ranks
    val bad = Seq((1L, -1L), (2L, 0L)).toDF("id", "tier")
    val err = intercept[Exception] {
      Sampling.curriculumShuffle(bad, "id", "tier", "spec", 16L).collect()
    }
    assert(err.getMessage != null)
    // fractional tier columns are rejected at plan time
    intercept[IllegalArgumentException] {
      Sampling.curriculumShuffle(Seq((1L, 1.5)).toDF("id", "tier"),
        "id", "tier", "spec", 16L)
    }
  }

  test("shardedShuffle excludes null ids and keeps ranks a gap-free bijection") {
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(2L), Row(null), Row(3L), Row(4L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val out = Sampling.shardedShuffle(withNull, "id", "spec", rowsPerShard = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the null row is gone; the 4 survivors still cover ranks 0..3 exactly
    // (a null bucket left in the counts would shift offsets and leave
    // rank 0 unassigned while dropping the row itself)
    assert(out.map(_._1).sorted === Array(1L, 2L, 3L, 4L))
    assert(out.map(_._2).sorted === Array(0L, 1L, 2L, 3L))
  }

  test("groupSplit: a near-dup cluster moves as a unit; split is the md5 bucket of its canon") {
    val df = (0L until 200L).toDF("doc_id")
    // components: {0,1,2} via chain 0-1, 1-2; {10,11}; everything else singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val rows = Sampling.groupSplit(df, "doc_id", pairs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("canon"), r.getAs[String]("split")))
    assert(rows.length === 200)
    val byId = rows.map(r => r._1 -> r).toMap
    // cluster members share one (canon, split); canon is the min member id
    assert(Set(byId(0L), byId(1L), byId(2L)).map(t => (t._2, t._3)).size === 1)
    assert(byId(0L)._2 === 0L)
    assert(byId(10L)._2 === 10L && byId(11L)._2 === 10L)
    assert(byId(10L)._3 === byId(11L)._3)
    // singletons canon to themselves
    assert(byId(50L)._2 === 50L)
    // every assignment equals the md5 hex-prefix rule, computed independently
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { case (_, canon, split) =>
      val h = md5hex(s"graft-split:$canon")
      val want = if (h < "c0") "train" else if (h < "e0") "val" else "test"
      assert(split === want, s"canon=$canon h=$h")
    }
    // at n=200 all three splits are populated (fixed digests — deterministic)
    assert(rows.map(_._3).toSet === Set("train", "val", "test"))
  }

  test("temperatureRates: head at 1.0, tail at sqrt(n/n_max); feeds mixtureSample") {
    val df = (0L until 100L).map(i => (i, if (i < 64) "big" else "small"))
      .toDF("doc_id", "source")
    val rates = Sampling.temperatureRates(df, "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rates("big") === ((64L, 1.0)))
    assert(rates("small") === ((36L, 0.75))) // sqrt(36/64) exactly
    // rates land in (0,1] -> directly consumable by mixtureSample
    val sampled = Sampling.mixtureSample(df, "doc_id", "source",
      rates.map { case (s, (_, r)) => s -> r })
    assert(sampled.filter($"source" === "big").count() === 64L)
    intercept[IllegalArgumentException](Sampling.temperatureRates(df, "source", 0.0))
  }

  test("epochExpand: per-source repeats with 0-based epochs; zero drops; default 1") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "source")
    val got = Sampling.epochExpand(df, "source", Map("a" -> 3, "b" -> 0))
      .select($"doc_id", $"epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq((1L, 0L), (1L, 1L), (1L, 2L), (3L, 0L)))
    // re-expanding expanded data fails fast instead of an ambiguous column
    val e = intercept[IllegalArgumentException](
      Sampling.epochExpand(Sampling.epochExpand(df, "source", Map.empty),
        "source", Map.empty))
    assert(e.getMessage.contains("already has an 'epoch' column"))
  }

  test("weightedSample equals the brute-force A-ES formula; excludes non-positive weights") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 200L).map(i =>
      (i, s"g${i % 3}", 1L + rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "g", "w")
    val got = Sampling.weightedSample(df, Seq("g"), "id", $"w", k = 4, seed = "s1")
      .select($"g", $"id", $"sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: same md5-derived uniform, same ln(u)/w key
    val md = java.security.MessageDigest.getInstance("MD5")
    def uOf(seed: String, id: Long): Double = {
      val hex = md.digest(s"$seed:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      math.max(java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0, 1e-300)
    }
    val want = rows.groupBy(_._2).flatMap { case (g, rs) =>
      rs.map { case (id, _, w) => (id, StrictMath.log(uOf("s1", id)) / w) }
        .sortBy { case (id, key) => (-key, id) }.take(4).zipWithIndex
        .map { case ((id, _), i) => (g, id, (i + 1).toLong) }
    }.toSet
    assert(got === want)
    // deterministic: same seed reproduces; different seed differs
    val again = Sampling.weightedSample(df, Seq("g"), "id", $"w", 4, "s1")
      .select($"g", $"id", $"sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === got)
    val other = Sampling.weightedSample(df, Seq("g"), "id", $"w", 4, "s2")
      .select($"g", $"id", $"sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(other !== got)
    // zero/negative/null weights never sample
    val edge = Seq((1L, "g", 0L), (2L, "g", -5L), (3L, "g", 7L))
      .toDF("id", "g", "w")
      .union(Seq((4L, "g")).toDF("id", "g").withColumn("w",
        org.apache.spark.sql.functions.lit(null).cast("long")))
    val kept = Sampling.weightedSample(edge, Seq("g"), "id", $"w", 10, "s")
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L))
  }

  test("weightedSample with empty keys: global bucket-decomposed top-k equals the one-window result") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 500L).map(i => (i, 1L + rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "w").repartition(7)
    val got = Sampling.weightedSample(df, Seq.empty, "id", $"w", k = 20, seed = "sg")
      .select($"id", $"sample_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the degenerate one-window formulation via a constant grouping key
    val oneWindow = Sampling.weightedSample(
        df.withColumn("g", lit(1)), Seq("g"), "id", $"w", 20, "sg")
      .select($"id", $"sample_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === oneWindow)
    assert(got.size === 20)
    // brute force over the whole table (no grouping)
    val md = java.security.MessageDigest.getInstance("MD5")
    def uOf(id: Long): Double = {
      val hex = md.digest(s"sg:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      math.max(java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0, 1e-300)
    }
    val want = rows.map { case (id, w) => (id, StrictMath.log(uOf(id)) / w) }
      .sortBy { case (id, key) => (-key, id) }.take(20).zipWithIndex
      .map { case ((id, _), i) => (id, (i + 1).toLong) }.toSet
    assert(got === want)
    // output hygiene: input columns + sample_rank only (no bucket leaks)
    assert(Sampling.weightedSample(df, Seq.empty, "id", $"w", 3, "sg")
      .columns.toSeq === Seq("id", "w", "sample_rank"))
  }

  test("weightedSample is weight-sensitive: a dominant weight wins almost always") {
    // one row with weight 10^6 vs 50 rows with weight 1: the heavy row's
    // key u^(1/w) ~ u^(1e-6) ~ 1 beats the light rows' u except for
    // astronomically unlucky u — deterministic check on this seed
    val df = ((0L until 50L).map(i => (i, 1L)) :+ (99L, 1000000L)).toDF("id", "w")
    val top = Sampling.weightedSample(df.withColumn("g",
        org.apache.spark.sql.functions.lit("x")), Seq("g"), "id", $"w", 1, "s")
      .select($"id").head().getLong(0)
    assert(top === 99L)
  }

  test("tokenBalancedShards: equal token mass within one document, clamped tail") {
    import org.apache.spark.sql.functions.{expr, col}
    // tokens 4,4,4,4,4,4 over 3 shards: total 24, target 8 -> 2 docs each
    val even = (1L to 6L).map(i => (i, 4L)).toDF("doc_id", "n_tokens")
    val g1 = Sampling.tokenBalancedShards(even, "n_tokens",
        expr("doc_id div 2"), Seq(col("doc_id")), nShards = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(g1 === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L, 6L -> 2L))
    // skewed: a giant doc owns its shard; the sliver past the last
    // boundary clamps to nShards-1 instead of inventing shard nShards
    val skew = Seq((1L, 10L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("doc_id", "n_tokens")
    val g2 = Sampling.tokenBalancedShards(skew, "n_tokens",
        expr("doc_id div 2"), Seq(col("doc_id")), nShards = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // total 13, target 7: exclusive cums 0,10,11,12 -> shards 0,1,1,1
    assert(g2 === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // all-empty corpus: target clamps to 1, everything lands in shard 0
    val empty = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "n_tokens")
    val g3 = Sampling.tokenBalancedShards(empty, "n_tokens",
        expr("doc_id"), Seq(col("doc_id")), nShards = 4)
      .collect().map(_.getLong(2)).toSet
    assert(g3 === Set(0L))
    intercept[IllegalArgumentException] {
      Sampling.tokenBalancedShards(even.withColumnRenamed("n_tokens", "shard"),
        "shard", expr("doc_id"), Seq(col("doc_id")), 2)
    }
  }

  test("budgetAllocations: shortfall from a small source redistributes by weight") {
    // budget 100, weights (a=1, b=1, c=2): ideal shares 25/25/50, but c
    // holds only 10 tokens -> c exhausts, 90 re-splits 45/45 over a and b
    val got = Sampling.budgetAllocations(
      Seq(("a", 1L, 1000L), ("b", 1L, 1000L), ("c", 2L, 10L)), 100L)
    assert(got === Seq(("a", 45L, false), ("b", 45L, false), ("c", 10L, true)))
    // cascade: after c exhausts, b (total 40) exhausts on the re-split,
    // and a absorbs the rest
    val cascade = Sampling.budgetAllocations(
      Seq(("a", 1L, 1000L), ("b", 1L, 40L), ("c", 2L, 10L)), 100L)
    assert(cascade === Seq(("a", 50L, false), ("b", 40L, true), ("c", 10L, true)))
    // everything exhausts: allocations are the totals, leftover unfilled
    val all = Sampling.budgetAllocations(Seq(("a", 1L, 5L), ("b", 3L, 7L)), 100L)
    assert(all === Seq(("a", 5L, true), ("b", 7L, true)))
    // zero-weight actives allocate 0; zero-weight zero-total is exhausted
    val zw = Sampling.budgetAllocations(
      Seq(("a", 0L, 50L), ("b", 1L, 1000L), ("z", 0L, 0L)), 100L)
    assert(zw === Seq(("a", 0L, false), ("b", 100L, false), ("z", 0L, true)))
    intercept[IllegalArgumentException] {
      Sampling.budgetAllocations(Seq(("a", 1L, 1L), ("a", 1L, 2L)), 10L)
    }
  }

  test("budgetMixture: greedy prefix per source under the redistributed allocations") {
    // source a: docs of 30+30+30 tokens (total 90); b: 10+10 (total 20);
    // weights equal, budget 60 -> ideal 30/30, b exhausts at 20 ->
    // a re-allocates 40 -> greedy prefix keeps a's first doc only
    // (30 <= 40, 60 > 40), all of b
    val docs = Seq(
      ("a", 1L, 30L), ("a", 2L, 30L), ("a", 3L, 30L),
      ("b", 4L, 10L), ("b", 5L, 10L))
      .toDF("source", "doc_id", "n_tokens")
    val got = Sampling.budgetMixture(docs, "source", "doc_id", "n_tokens",
        weights = Map("a" -> 1L, "b" -> 1L), budget = 60L)
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(got === Seq(1L, 4L, 5L))
    // absent source under defaultWeight 0 contributes nothing
    val withC = docs.union(Seq(("c", 6L, 5L)).toDF("source", "doc_id", "n_tokens"))
    val gotC = Sampling.budgetMixture(withC, "source", "doc_id", "n_tokens",
        weights = Map("a" -> 1L, "b" -> 1L), budget = 60L)
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(gotC === Seq(1L, 4L, 5L))
    // the bucket-decomposed selection keeps exactly the same rows
    val gotB = Sampling.budgetMixture(docs, "source", "doc_id", "n_tokens",
        weights = Map("a" -> 1L, "b" -> 1L), budget = 60L,
        bucket = Some(expr("doc_id div 2")))
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(gotB === Seq(1L, 4L, 5L))
  }

  test("clusterCap: dominant cluster flattens to the cap, sparse clusters pass whole") {
    // two planted topics on orthogonal axes; topic 0 floods (4 rows),
    // topic 1 is sparse (2 rows); scaling must not change assignment
    val emb = Seq(
      (1L, Array(2.0f, 0.0f)), (2L, Array(5.0f, 0.1f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(9.0f, 0.2f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.1f, 3.0f)))
      .toDF("vec_id", "embedding")
    val cents = Array(
      (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
    val kept = Sampling.clusterCap(emb, "vec_id", "embedding", cents, n = 2)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSet
    // cluster 0 keeps its two LOWEST ids (deterministic order), cluster 1 whole
    assert(kept === Set(1L -> 0, 2L -> 0, 10L -> 1, 11L -> 1))
  }
}
