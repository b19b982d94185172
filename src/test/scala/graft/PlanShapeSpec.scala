package graft

import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan shape pins for flagship queries: pushdown, pruning,
  * broadcast choice, and partial aggregation are the properties that make
  * these plans survive 100 TB — assert them so a refactor cannot silently
  * trade one away while results stay correct. String-level checks on the
  * executed plan are deliberate: they catch regressions wherever they
  * originate (operator code, conf defaults, Spark upgrade).
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q01 projection prunes the parquet scan to the selected columns") {
    val p = plan("q01_project_scan")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_totalprice:double,o_orderdate:timestamp"), p.linesIterator.toSeq.last)
    assert(!p.contains("o_comment"), "unreferenced columns must not be read")
  }

  test("q04 watermark filter is pushed into the parquet scan") {
    val p = plan("q04_incr_ts")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate"), p)
  }

  test("q12 joins the tiny dimension with a broadcast, not a shuffle") {
    val p = plan("q12_group_fold")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q40 explode is absorbed by a map-side partial aggregate and top-k") {
    val p = plan("q40_vocab_topk")
    // partial_count BELOW the exchange: hot tokens combine before shuffling
    val partialIdx = p.indexOf("partial_count")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(token")
    assert(partialIdx > exchangeIdx && exchangeIdx >= 0,
      s"expected partial aggregate under the token exchange:\n$p")
    // top-k must be TakeOrderedAndProject, never a global sort of all tokens
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q41 as-of join costs exactly one hash exchange (plus the final sort)") {
    val p = plan("q41_asof_join")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected a single keyed shuffle:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"), p)
  }

  test("q16 exact dedup is one hash-aggregate shuffle, no join") {
    val p = plan("q16_dedup_exact")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), s"dedup must not plan a join:\n$p")
  }

  test("q05 id incremental pushes the strict > predicate into the scan") {
    val p = plan("q05_incr_id")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), GreaterThan(l_orderkey,3000)"), p)
  }

  test("q48 repetition is a narrow pass: no join, no hash exchange") {
    val p = plan("q48_repetition")
    assert(!p.contains("Join"), s"repetition must not plan a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-document expressions must not shuffle:\n$p")
  }

  test("q49 decontamination semi-joins and never broadcasts the corpus side") {
    val p = plan("q49_decontaminate")
    assert(p.contains("LeftSemi"), p)
    // the doc_id >= 250 corpus half is the probe side; only the benchmark
    // n-gram set may end up broadcast. A broadcast whose build side scans
    // doc_id >= 250 would be the corpus — assert the only pushed >= filter
    // feeding a broadcast is the benchmark's < 250
    val broadcastIdx = p.indexOf("BroadcastExchange")
    if (broadcastIdx >= 0) {
      val buildSide = p.substring(broadcastIdx)
      assert(!buildSide.contains("GreaterThanOrEqual(doc_id,250)"),
        s"corpus side must never be the broadcast build side:\n$p")
    }
  }

  test("q51 row_number and lag share ONE window (single sort, single shuffle)") {
    val p = plan("q51_event_lag")
    assert("\\bWindow\\b".r.findAllIn(p).size === 1, s"expected one Window node:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected a single keyed shuffle:\n$p")
  }

  test("q90 delete propagation reads the source key set as a key-only scan") {
    val p = plan("q90_sync_deletes")
    // the semi-join's build side must be the PRUNED scan: one of the
    // orders.parquet scans reads only the pk column — delete correctness
    // costs key bytes, not a second full-row extract
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint>"),
      s"expected a key-only scan for the source key set:\n$p")
    assert(p.contains("LeftSemi"), p)
  }

  test("q28 JSON repair is a native expression in the plan, not a Scala UDF") {
    val p = plan("q28_json_extract")
    assert(!p.contains("UDF("), s"no Scala UDF may remain in any graded plan:\n$p")
    assert(p.toLowerCase.contains("jsonrepairexpr"), p)
  }

  test("q52 histogram partial-aggregates below its single exchange") {
    val p = plan("q52_histogram")
    // the group key is the div expression (_groupingexpression), so match
    // the exchange generically and require the partial count BELOW it
    val partialIdx = p.indexOf("partial_count")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(_groupingexpression")
    assert(partialIdx > exchangeIdx && exchangeIdx >= 0,
      s"expected map-side partial counts under the bucket exchange:\n$p")
  }

  test("q207 mojibake repair is a pure narrow projection: no join, no keyed shuffle") {
    val p = plan("q207_fix_mojibake")
    // the repair is per-row JVM work in one codegen'd expression — only
    // the graded orderBy's range exchange may move data
    assert(!p.contains("Join"), s"mojibake repair must not plan a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"mojibake repair must not shuffle by key:\n$p")
    assert(!p.contains("UDF("), s"no Scala UDF may remain in any graded plan:\n$p")
  }

  test("mixtureSample is a pure narrow filter: no exchange, no join") {
    val df = graft.operators.Sampling.mixtureSample(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "source",
      Map("src0" -> 1.0), defaultRate = 0.5)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"the mixture filter must compose into the scan:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q63 source report is ONE grouped pass: a single hash exchange, no join") {
    val p = plan("q63_source_quality")
    assert(!p.contains("Join"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected one keyed shuffle:\n$p")
  }

  test("q66 packing is one keyed window shuffle (plus the final sort)") {
    val p = plan("q66_packing")
    assert(!p.contains("Join"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected one keyed shuffle:\n$p")
    assert("\\bWindow\\b".r.findAllIn(p).size === 1, s"expected one Window node:\n$p")
  }

  test("q67 cube is ONE Expand + one keyed aggregate exchange, never 2^d scans") {
    val p = plan("q67_cube_counts")
    assert("\\bExpand\\b".r.findAllIn(p).size === 1, s"expected one Expand node:\n$p")
    assert("Scan parquet".r.findAllIn(p).size === 1, s"CUBE must scan once:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected one aggregate shuffle:\n$p")
  }

  test("q68 star join broadcasts both dimensions; the fact side never shuffles pre-agg") {
    val p = plan("q68_star_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, s"expected two broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"only the final aggregate may shuffle:\n$p")
  }

  test("q70 scrub composes into the scan: no join, no keyed shuffle") {
    val p = plan("q70_scrub")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      s"regex scrub must stay narrow:\n$p")
  }

  test("q71 bigram counts partial-aggregate below the (w1,w2) exchange") {
    val p = plan("q71_bigram_lm")
    assert(!p.contains("Join"), p)
    val partialIdx = p.indexOf("partial_count")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(w1")
    assert(partialIdx > exchangeIdx && exchangeIdx >= 0,
      s"expected map-side combine under the pair exchange:\n$p")
  }

  test("q76 rollup is one Expand over three broadcast joins, no sort-merge") {
    val p = plan("q76_rollup_geo")
    assert("\\bExpand\\b".r.findAllIn(p).size === 1, s"expected one Expand node:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 3, s"expected three broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q80 gap fill evaluates the observations ONCE and fills in one Window") {
    val p = plan("q80_gap_fill")
    assert(!p.contains("CartesianProduct"), s"grid join must stay keyed:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"grid join must stay keyed:\n$p")
    // the rank-1 pipeline runs in the localCheckpoint job; the main plan
    // holds only the FILL window — seeing the rank window here (or twice)
    // means the observation pipeline is being re-executed per consumer
    assert("\\bWindow\\b".r.findAllIn(p).size === 1, s"expected only the fill window:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).size === 2,
      s"both consumers must read the checkpointed observations:\n$p")
  }

  test("q94 passage dedup stays equi-join: no cartesian, no nested-loop, text scanned narrow") {
    val p = plan("q94_passage_dedup")
    assert(!p.contains("CartesianProduct"), s"anchor join must stay an equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"anchor join must stay an equi-join:\n$p")
    // the df-gate aggregate partial-combines below its exchange: singleton
    // grams (most of the index) collapse map-side before any shuffle
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(__g")
    assert(exchangeIdx >= 0, s"expected a gram-hash exchange:\n$p")
    assert(p.indexOf("partial_count", exchangeIdx) > exchangeIdx,
      s"expected partial aggregate under the gram-hash exchange:\n$p")
  }

  test("q188 duplicated-span dedup stays equi-join with a partial-aggregated df gate") {
    val p = plan("q188_dup_span_stats")
    assert(!p.contains("CartesianProduct"), s"anchor join must stay an equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"anchor join must stay an equi-join:\n$p")
    // the [2, maxDf] gate partial-combines below the gram-hash exchange
    // (the q94 contract — singleton grams collapse map-side) and the
    // island windows key on (pair, diagonal), never one global partition
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(__g")
    assert(exchangeIdx >= 0, s"expected a gram-hash exchange:\n$p")
    assert(p.indexOf("partial_count", exchangeIdx) > exchangeIdx,
      s"expected partial aggregate under the gram-hash exchange:\n$p")
    assert(!p.contains("Exchange SinglePartition, ENSURE"),
      s"island windows must stay (pair, diagonal)-keyed:\n$p")
  }

  test("scoreJoin broadcasts the weight table; no cartesian anywhere") {
    // q189's lambda returns a localCheckpoint (an RDD scan), so pin the
    // scorer's own plan over the same shapes instead
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = graft.text.Classifier.docFeatures(
      graft.text.Classifier.hashedTokenFeatures(
        Seq((1L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text", 16),
      Seq((1L, 1L)).toDF("doc_id", "y"), "doc_id")
    val w = Seq((-1L, 0L), (0L, 5L)).toDF("f", "w_micros")
    val p = graft.text.Classifier.scoreJoin(docs, "doc_id", w)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"weights must join equi on the bucket key:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the dims-bounded weight table must broadcast:\n$p")
  }

  test("q192 budget mixture: allocations ride as a literal map over bucket-decomposed prefix windows") {
    val df = SparkEntry.queries("q192_budget_mixture")(spark, dir)
    df.collect() // AQE materializes exchange reuse only in the FINAL plan
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // the allocation itself still rides as a literal map — the only join
    // in the selection is the broadcast of (source, bucket) offsets (the
    // q153 decomposition); source-level ALLOCATION state must not join
    assert(!finalSection.contains("SortMergeJoin"),
      s"only the broadcast offsets join is allowed in the selection:\n$p")
    assert("ReusedExchange.*hashpartitioning\\(source#\\d+, __b".r.findFirstIn(finalSection).isDefined,
      s"offsets branch must reuse the (source, bucket) exchange:\n$finalSection")
    // exactly one MATERIALIZED corpus-sized (source, __b) exchange; the
    // offsets branch's own ENSURE exchange runs over only the per-(key,
    // bucket) representative rows — broadcast-sized, not counted
    assert("\\+- Exchange hashpartitioning\\(source#\\d+, __b".r.findAllIn(finalSection).size === 1,
      s"expected ONE materialized (source, bucket) exchange:\n$finalSection")
    assert(finalSection.contains("BroadcastHashJoin"), s"offset join must broadcast:\n$p")
    assert(!finalSection.contains("Exchange SinglePartition, ENSURE"),
      s"the prefix windows must stay (source, bucket)-keyed:\n$finalSection")
  }

  test("q96 semantic dedup joins only within clusters — equi on the cluster id") {
    val p = plan("q96_semantic_dedup")
    assert(!p.contains("CartesianProduct"), s"pair join must be bounded by cluster:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"pair join must be bounded by cluster:\n$p")
  }

  test("q98 trailing RANGE window is one keyed shuffle, no join") {
    val p = plan("q98_trailing_window")
    assert(!p.contains("Join"), s"a rolling window must not plan a join:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected a single keyed shuffle:\n$p")
  }

  test("q100 token budget: (source, bucket) prefix windows, offsets broadcast, one corpus shuffle") {
    // sources are low-cardinality: the running sum must NEVER run as one
    // window partition per source (a 10 TB single-task sort at scale) —
    // it routes through the keyed bucket decomposition (the q153 shape)
    val df = SparkEntry.queries("q100_token_budget")(spark, dir)
    df.collect() // AQE materializes exchange reuse only in the FINAL plan
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // the offsets branch reuses the (source, __b) data exchange; exactly
    // one materialized corpus exchange feeds both
    assert("ReusedExchange.*hashpartitioning\\(source#\\d+, __b".r.findFirstIn(finalSection).isDefined,
      s"offsets branch must reuse the (source, bucket) exchange:\n$finalSection")
    // exactly one MATERIALIZED corpus-sized (source, __b) exchange; the
    // offsets branch's own ENSURE exchange runs over only the per-(key,
    // bucket) representative rows — broadcast-sized, not counted
    assert("\\+- Exchange hashpartitioning\\(source#\\d+, __b".r.findAllIn(finalSection).size === 1,
      s"expected ONE materialized (source, bucket) exchange:\n$finalSection")
    // per-key bucket offsets rejoin by broadcast — never a corpus-sized
    // shuffle join, and never a single-partition funnel
    assert(finalSection.contains("BroadcastHashJoin"), s"offset join must broadcast:\n$p")
    assert(!finalSection.contains("SortMergeJoin"), p)
    assert(!finalSection.contains("Exchange SinglePartition, ENSURE"),
      s"the prefix sum must never funnel through one partition:\n$finalSection")
  }

  test("q109 fuzzy join blocks on variant hashes: equi-join, never a cross join") {
    val p = plan("q109_fuzzy_join")
    // the whole point of deletion blocking is replacing the unhashable
    // levenshtein cross join — the plan must contain ONLY equi-joins
    assert(!p.contains("CartesianProduct"), s"blocking must stay an equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"blocking must stay an equi-join:\n$p")
    // at gate scale the build side broadcasts; at 100 TB AQE shuffles it —
    // either way the join itself must key on the variant hash
    assert("(?:BroadcastHash|SortMerge|ShuffledHash)Join \\[__vk".r.findFirstIn(p).isDefined,
      s"expected an equi-join keyed on the variant hash:\n$p")
  }

  test("q110 box join blocks on grid cells: equi-join on both band keys") {
    val p = plan("q110_box_join")
    assert(!p.contains("CartesianProduct"), s"grid blocking must stay an equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"grid blocking must stay an equi-join:\n$p")
    // both band keys participate in the join clustering
    assert(p.contains("__bx") && p.contains("__by"),
      s"expected (x band, y band) join keys in the plan:\n$p")
  }

  test("resizeImages is a pure narrow map: no exchange, no join") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val media = graft.multimodal.Multimodal.attachBinary(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
    val p = graft.multimodal.Multimodal.resizeImages(media, 8, 6)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"a thumbnail stage must not shuffle:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("batch k-NN joins broadcast the QUERY side; the corpus never shuffles pre-score") {
    import org.apache.spark.sql.functions.col
    import graft.similarity.Similarity
    val emb = Tables(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 25)
    // exact form: the corpus rides a broadcast cross join (query side is
    // the broadcast relation) and the ONLY hash exchange is the narrow
    // (query, neighbor, score) stream into the per-query rank window
    val p1 = Similarity.knnJoin(queries, emb, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast into the corpus scan:\n$p1")
    assert("Exchange hashpartitioning".r.findAllIn(p1).size === 1,
      s"only the rank window may shuffle:\n$p1")
    // IVF form: candidates come from an EQUI-join on the probed cell id —
    // never a cartesian over the corpus
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding", numCentroids = 8)
    val p2 = Similarity.knnJoinIvf(index, queries, "vec_id", "embedding", 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct") &&
      "BroadcastHashJoin \\[.*__centroid".r.findFirstIn(p2).isDefined,
      s"cell blocking must stay a broadcast equi-join on __centroid:\n$p2")
    // PQ form: the code scan joins the broadcast LUT column; the rescore
    // touches full vectors only through the shortlist equi-join
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val encoded = Similarity.pqEncode(emb, "vec_id", "embedding", cb)
    val p3 = Similarity.knnJoinPq(encoded, emb, cb, queries, "vec_id", "embedding",
        k = 5, shortlist = 40)
      .queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastNestedLoopJoin"),
      s"per-query LUTs must broadcast into the code scan:\n$p3")
    assert(!p3.contains("CartesianProduct"),
      s"the rescore must join on neighbor_id, not cross:\n$p3")
    // SQ form: the dequantized code scan rides the same broadcast cross
    // join (query side broadcast, corpus codes never shuffle pre-score)
    val sq = Similarity.sqTrain(emb, "embedding", dim = 64)
    val sqEnc = Similarity.sqEncode(emb, "vec_id", "embedding", sq)
    val p4 = Similarity.knnJoinSq(sqEnc, emb, sq, queries, "vec_id", "embedding",
        k = 5, shortlist = 40)
      .queryExecution.executedPlan.toString
    assert(p4.contains("BroadcastNestedLoopJoin"),
      s"queries must broadcast into the SQ code scan:\n$p4")
    assert(!p4.contains("CartesianProduct"),
      s"the SQ rescore must join on neighbor_id, not cross:\n$p4")
  }

  test("hardNegatives keeps q112's shape; centroidAudit assigns in a narrow scan") {
    import org.apache.spark.sql.functions.col
    import graft.similarity.Similarity
    val emb = Tables(spark, dir, "embeddings")
    // mining: query side broadcast, corpus scanned once, label predicate
    // and ceiling fused pre-window — only the rank window may shuffle
    val p1 = Similarity.hardNegatives(emb.filter(col("vec_id") < 25), emb,
        "vec_id", "embedding", "label", k = 5)
      .queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast into the corpus scan:\n$p1")
    assert("Exchange hashpartitioning".r.findAllIn(p1).size === 1,
      s"only the rank window may shuffle:\n$p1")
    // audit: centroids re-enter as literals, so the assignment pass is a
    // pure narrow map over the corpus — no join, no exchange at all
    val p2 = Similarity.centroidAudit(emb, "vec_id", "embedding", "label")
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange") && !p2.contains("Join"),
      s"the audit scan must stay narrow (centroids are literals):\n$p2")
  }

  test("bpePairCounts top-k is TakeOrdered; miningTriplets scans the corpus once") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, dir, "documents")
    // the top-50 must run as per-partition heaps (k rows to the driver),
    // never a global sort of the full pair table
    val p1 = graft.text.TextAnalysis.bpePairCounts(docs, "text")
      .orderBy(col("cnt").desc, col("pair")).limit(50)
      .queryExecution.executedPlan.toString
    assert(p1.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort:\n$p1")
    // one scan serves positives and negatives: exactly one corpus read
    val emb = Tables(spark, dir, "embeddings")
    val p2 = graft.similarity.Similarity.miningTriplets(
        emb.filter(col("vec_id") < 25), emb, "vec_id", "embedding", "label")
      .queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastNestedLoopJoin"),
      s"anchors must broadcast into the corpus scan:\n$p2")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p2).size === 1,
      s"both triplet sides must ride ONE corpus scan:\n$p2")
  }

  test("embedDupIds broadcasts the batch into one corpus scan; only ids shuffle") {
    import org.apache.spark.sql.functions.col
    import graft.similarity.Similarity
    val emb = Tables(spark, dir, "embeddings")
    val batch = emb.filter(col("vec_id") < 25)
    val p = Similarity.embedDupIds(batch, emb, "vec_id", "embedding", 0.95)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the arrival batch must broadcast into the corpus scan:\n$p")
    // the only hash exchange is the distinct over matched ids — the corpus
    // (vector payloads) must never shuffle pre-score
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"only the id distinct may shuffle:\n$p")
  }

  test("oovBuckets joins the model by BROADCAST and prunes the doc scan to id+text") {
    import org.apache.spark.sql.functions.col
    import graft.text.NgramStats
    val docs = Tables(spark, dir, "documents")
    // the deployment shape: the model is a PERSISTED table (its build
    // exchange happened at train time), so the scoring plan is judged
    // alone — an inline-built model would contribute its own exchange
    val tmp = java.nio.file.Files.createTempDirectory("graft_psq125")
    try {
      NgramStats.bigramCounts(docs.filter(col("doc_id") < 250), "doc_id", "text")
        .write.parquet(s"$tmp/lm")
      val lm = spark.read.parquet(s"$tmp/lm")
      val p = NgramStats.oovBuckets(docs.filter(col("doc_id") >= 250), lm, "doc_id", "text")
        .queryExecution.executedPlan.toString
    // the vocabulary²-bounded model must ride a broadcast into the scored
    // corpus' bigram stream — a sort-merge there shuffles the whole corpus
    // by bigram string at 100 TB
    assert(p.contains("BroadcastHashJoin"), s"model join must broadcast:\n$p")
    // the scored side reads only (doc_id, text): lang/source/n_chars pruned
    assert("ReadSchema: struct<doc_id:bigint,text:string>".r.findFirstIn(p).isDefined,
      s"doc scan must prune to id+text:\n$p")
    // bigram adjacency comes from the token array, NOT a per-doc window:
    // the window formulation shuffled every TOKEN row by doc id before
    // aggregating — the only keyed exchange allowed here carries the
    // map-side-combined per-doc partials
    assert(!p.contains("Window"), s"no per-doc window in the scoring pass:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"only the per-doc aggregate may shuffle:\n$p")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q141 winnowing is one narrow projection: no shuffle, no window, no join") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val p = graft.text.Winnow.fingerprints(docs, "doc_id", "text", 3, 4)
      .queryExecution.executedPlan.toString
    // the whole tokenize -> gram-hash -> window-minimize computation lives
    // in the array expression domain of the scan projection; an
    // explode-then-window formulation would repartition the corpus by doc
    assert(!p.contains("Exchange"), s"winnowing must not shuffle:\n$p")
    assert(!p.contains("Window"), s"winnowing must not plan a window:\n$p")
    assert(!p.contains("Join"), s"winnowing must not plan a join:\n$p")
    assert("ReadSchema: struct<doc_id:bigint,text:string>".r.findFirstIn(p).isDefined,
      s"doc scan must prune to id+text:\n$p")
  }

  test("q145 encode is a pure narrow projection: no exchange, no join, pruned scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet") // raw: pruning is the operator's to prove
    val p = graft.text.Vocab.encodeWith(docs, "doc_id", "text",
        Map("the" -> 1L, "cat" -> 2L))
      .queryExecution.executedPlan.toString
    // the vocab rides as one map literal; an explode+join formulation
    // would shuffle the 100 TB token stream by doc id to reassemble
    assert(!p.contains("Exchange"), s"encode must not shuffle:\n$p")
    assert(!p.contains("Join"), s"encode must not plan a join:\n$p")
    assert("ReadSchema: struct<doc_id:bigint,text:string>".r.findFirstIn(p).isDefined,
      s"doc scan must prune to id+text:\n$p")
  }

  test("q144 self-scrub joins hashed gram keys equi-wise, never a cartesian") {
    val p = plan("q144_self_scrub_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"self-scrub must stay equi-join:\n$p")
    // hot-gram gate: the df aggregate must partial-aggregate below its
    // exchange (the Zipf head combines map-side before shuffling)
    assert(p.contains("partial_count"), s"df gate must map-side combine:\n$p")
  }

  test("q140 BM25 probes postings with the query-term side broadcast") {
    val p = plan("q140_bm25_topk")
    // the <=|query terms| (token, df) rows broadcast into the tf join —
    // a sort-merge there shuffles the full postings table by token
    assert(p.contains("BroadcastHashJoin"), s"query-term join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-wide sort-merge join:\n$p")
  }

  test("q149 encodeJoin: vocab joins by BROADCAST, one doc-keyed exchange") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val vocab = graft.text.Vocab.build(docs, "text", topN = 50)
    val p = graft.text.Vocab.encodeJoin(docs, "doc_id", "text", vocab)
      .queryExecution.executedPlan.toString
    // the vocab side broadcasts (the whole point vs the literal map: O(1)
    // probes without a plan-sized literal); a sort-merge would shuffle
    // the 100 TB token stream BY TOKEN before the doc-id reassembly
    assert(p.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream must not sort-merge:\n$p")
    // exactly one data-sized exchange: the doc-id reassembly (the
    // documented trade vs encode's zero); vocab-sized exchanges for the
    // top-N build don't hash doc_id
    val docExchanges = "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size
    assert(docExchanges === 1, s"expected one doc-keyed shuffle:\n$p")
  }

  test("q153 global running sum: per-bucket windows, corpus shuffled once, offsets broadcast") {
    val df = SparkEntry.queries("q153_global_running_sum")(spark, dir)
    df.collect() // AQE materializes exchange reuse only in the FINAL plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.startsWith("AdaptiveSparkPlan isFinalPlan=true"), p.linesIterator.next())
    val finalSection = p.split("== Initial Plan ==").head
    // the data-sized window is PARTITIONED (per-bucket, parallel); the
    // only unpartitioned window orders the ~|buckets| representatives
    assert(finalSection.contains("Window [sum"), p)
    // the offsets branch REUSES the data branch's bucket shuffle — the
    // corpus is scanned and shuffled exactly once (this is what the
    // AssertNotNull non-nullable bucket key buys: with a nullable key the
    // inner join's IsNotNull pushes into only one subtree and reuse
    // breaks, observed as a double corpus scan)
    assert("ReusedExchange.*hashpartitioning\\(__b".r.findFirstIn(finalSection).isDefined,
      s"offsets branch must reuse the bucket exchange:\n$finalSection")
    // exactly one MATERIALIZED bucket exchange (the ReusedExchange line
    // cites it; no third appearance may plan its own)
    val bucketExchanges = "\\+- Exchange hashpartitioning\\(__b".r
      .findAllIn(finalSection).size
    assert(bucketExchanges === 1,
      s"expected ONE materialized bucket exchange:\n$finalSection")
    // bucket totals rejoin by broadcast — never a data-sized shuffle join
    assert(finalSection.contains("BroadcastHashJoin"), s"offset join must broadcast:\n$p")
    assert(!finalSection.contains("SortMergeJoin"), p)
  }

  test("q69 strata sample: bucket-decomposed exact rank, no per-stratum window, no global sort") {
    val df = SparkEntry.queries("q69_strata_sample")(spark, dir)
    df.collect() // AQE materializes exchange reuse only in the FINAL plan
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // the ranking window is PARTITIONED per bucket (parallel); the naive
    // plan's global-ntile and per-stratum row_number windows — both
    // SinglePartition or nStrata-keyed funnels — must not exist: stratum
    // and within-stratum rank are integer expressions of the global rank
    assert("windowspecdefinition\\(__b".r.findFirstIn(finalSection).isDefined,
      s"ranking window must partition by the bucket:\n$finalSection")
    assert(!finalSection.contains("ntile"),
      s"stratum must derive from the exact rank, not a global ntile:\n$finalSection")
    // the only unpartitioned stage is the offsets branch over the
    // ~|buckets| representatives (bounded — the q153 shape): any
    // SinglePartition exchange must sit BELOW the reused bucket exchange's
    // citation, i.e. inside the offsets branch, never on the data path
    val reuseIdx = finalSection.indexOf("ReusedExchange")
    val spIdx = finalSection.indexOf("Exchange SinglePartition, ENSURE")
    assert(spIdx < 0 || (reuseIdx >= 0 && spIdx < reuseIdx &&
        finalSection.indexOf("BroadcastExchange") < spIdx),
      s"a SinglePartition exchange may only rank the offsets representatives:\n$finalSection")
    // offsets branch reuses the single materialized bucket exchange
    // (the q153 discipline)
    assert("ReusedExchange.*hashpartitioning\\(__b".r.findFirstIn(finalSection).isDefined,
      s"offsets branch must reuse the bucket exchange:\n$finalSection")
    assert("\\+- Exchange hashpartitioning\\(__b".r.findAllIn(finalSection).size === 1,
      s"expected ONE materialized bucket exchange:\n$finalSection")
    assert(finalSection.contains("BroadcastHashJoin"), s"offset join must broadcast:\n$p")
    assert(!finalSection.contains("SortMergeJoin"), p)
  }

  test("q106 sharded shuffle: offsets branch reuses the single corpus exchange") {
    val df = SparkEntry.queries("q106_shard_shuffle")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // same discipline as q153: the 256-bucket offset branch must ride the
    // data branch's shuffle, not re-scan and re-hash the corpus
    assert("ReusedExchange.*hashpartitioning\\(__b".r.findFirstIn(finalSection).isDefined,
      s"offsets branch must reuse the bucket exchange:\n$finalSection")
    val bucketExchanges = "\\+- Exchange hashpartitioning\\(__b".r
      .findAllIn(finalSection).size
    assert(bucketExchanges === 1,
      s"expected ONE materialized bucket exchange:\n$finalSection")
  }

  test("q156 weighted sample is one keyed window shuffle: no join, pruned-ish scan") {
    val p = plan("q156_weighted_sample")
    assert(!p.contains("Join"), s"A-ES sampling must not plan a join:\n$p")
    // exactly one data exchange (the keyed window) besides the final sort
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected one keyed shuffle:\n$p")
  }

  test("q162 global weighted sample: bucketed data window, survivors-only global re-rank") {
    val p = plan("q162_global_weighted_sample")
    assert(!p.contains("Join"), s"A-ES sampling must not plan a join:\n$p")
    // the corpus-sized window runs per md5 bucket in parallel — a global
    // keys=none sample must NEVER funnel the corpus through one window
    // partition; only the <= 256·k survivors re-rank unpartitioned
    assert("windowspecdefinition\\(__b".r.findFirstIn(p).isDefined,
      s"data window must partition by the md5 bucket:\n$p")
    // one bucket shuffle over the data (the per-bucket window); the
    // survivor re-rank and final sort are sample-sized
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected one bucket shuffle:\n$p")
  }

  test("bpeEncode is a pure narrow projection: no exchange, no join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = docs.select(graft.text.TextAnalysis.bpeEncode(
        org.apache.spark.sql.functions.col("text"),
        Seq(graft.text.TextAnalysis.BpeMerge(0, "t", "h", 1L))))
      .queryExecution.executedPlan.toString
    // the merge replay is per-row JVM work behind a reference object —
    // nothing may move for it
    assert(!p.contains("Exchange"), s"bpeEncode must not shuffle:\n$p")
    assert(!p.contains("Join"), s"bpeEncode must not plan a join:\n$p")
  }

  test("q166 unigram encode is join-free: the piece table rides as a reference object") {
    val p = plan("q166_unigram_encode")
    // Viterbi is per-row JVM work; only the final presentation sort may
    // move data — a hash exchange or join would mean the vocabulary was
    // planned as a table instead of a literal
    assert(!p.contains("Join"), s"unigram encode must not plan a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"unigram encode must not shuffle by key:\n$p")
  }

  test("q180 wordpiece encode is join-free: the vocabulary rides as a reference object") {
    val p = plan("q180_wordpiece_encode")
    // greedy matching is per-row JVM work; only the final presentation
    // sort may move data — a hash exchange or join would mean the
    // vocabulary was planned as a table instead of a literal
    assert(!p.contains("Join"), s"wordpiece encode must not plan a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"wordpiece encode must not shuffle by key:\n$p")
  }

  test("q184 fertility audit: three tokenizers in one narrow pass, no join, no keyed shuffle") {
    val p = plan("q184_tokenizer_fertility")
    // all three piece counts are reference-object expressions in one
    // projection — a join or hash exchange would mean a tokenizer was
    // planned as a table, or the pass split
    assert(!p.contains("Join"), s"fertility audit must not plan a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"fertility audit must not shuffle by key:\n$p")
  }

  test("q185 training windows: bucket-decomposed stream cumsum, group-keyed reassembly") {
    val df = SparkEntry.queries("q185_training_windows")(spark, dir)
    df.collect() // AQE materializes the FINAL plan
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // the stream cumsum partitions by (source, bucket) — never one window
    // partition per source (the q100/q153 discipline). The token arrays
    // are a heavy payload, so the offsets come from the aggOffsets
    // branch: exactly ONE corpus-sized repartition moves the payload,
    // and the offsets side partial-aggregates map-side (partial_sum
    // BELOW its exchange) before a representatives-only shuffle
    assert("Exchange hashpartitioning\\(source#\\d+, __b#\\d+L, \\d+\\), REPARTITION_BY_NUM"
        .r.findAllIn(finalSection).size === 1,
      s"expected exactly ONE corpus-sized (source, bucket) repartition:\n$finalSection")
    val aggExchange = "Exchange hashpartitioning\\(source#\\d+, __b#\\d+L, \\d+\\), ENSURE_REQUIREMENTS"
      .r.findFirstMatchIn(finalSection)
    assert(aggExchange.isDefined,
      s"expected the partial-aggregated offsets exchange:\n$finalSection")
    assert(finalSection.lastIndexOf("partial_sum") > aggExchange.get.start,
      s"offsets totals must partial-aggregate below their exchange:\n$finalSection")
    assert(finalSection.contains("BroadcastHashJoin"), s"offset join must broadcast:\n$p")
    assert(!finalSection.contains("SortMergeJoin"),
      s"only the broadcast offsets join may appear:\n$p")
    assert(!finalSection.contains("Exchange SinglePartition, ENSURE"),
      s"the prefix sum must never funnel through one partition:\n$finalSection")
    assert(finalSection.contains("Window"), s"expected the bucketed prefix-sum windows:\n$p")
  }

  test("q187 langid: profiles broadcast, one corpus scan, no single-partition funnel") {
    // built directly (the unigram-train-round pin pattern): the graded
    // query checkpoints its result, which would hide the classify plan
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val profiles = graft.text.LangProfile
      .trainProfiles(docs, "lang", "text", 40).localCheckpoint()
    try {
      val p = graft.text.LangProfile
        .classify(docs, "doc_id", "text", profiles, 40)
        .queryExecution.executedPlan.toString
      // the language-profile lookup must broadcast (languages·k rows) —
      // a shuffled join would move the doc-profile side twice
      assert(p.contains("BroadcastHashJoin"), s"profile lookup must broadcast:\n$p")
      // ranking windows are keyed (per doc) — never one partition
      assert(!p.contains("Exchange SinglePartition"),
        s"no stage may funnel through one partition:\n$p")
      // with profiles materialized, the corpus is scanned exactly once
      // (the doc-profile explode) — both profile references read the
      // checkpoint, never re-running the train plan
      assert("documents\\.parquet".r.findAllIn(p).size <= 1,
        s"classify must scan the corpus once:\n$p")
    } finally graft.Checkpoints.release(profiles)
  }

  test("unigram train round: segmentation narrow, ONE piece-keyed exchange, partial sums below it") {
    val words = graft.text.TextAnalysis.bpeWordTable(
      spark.read.parquet(s"$dir/documents.parquet"), "text").localCheckpoint()
    try {
      val seg = graft.functions.UnigramEncode(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.col("__w")),
        Seq(("t", -3000L), ("th", -7000L)), -100000L)
      val p = words
        .select(org.apache.spark.sql.functions.explode(seg).as("piece"),
          org.apache.spark.sql.functions.col("__c"))
        .groupBy("piece").agg(org.apache.spark.sql.functions.sum("__c").as("cnt"))
        .queryExecution.executedPlan.toString
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashExchanges === 1, s"expected exactly the piece-count shuffle:\n$p")
      // map-side combine: the Zipf head collapses before it moves
      assert(p.indexOf("partial_sum") > p.indexOf("Exchange hashpartitioning"),
        s"expected partial aggregation below the exchange:\n$p")
      assert(!p.contains("Join"), s"the round must not plan a join:\n$p")
    } finally graft.Checkpoints.release(words)
  }

  test("classifier scoring is a pure narrow pass over the feature table: no exchange, no join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(50)
    val labels = docs.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.lit(1L).as("y"))
    val feats = graft.text.Classifier.hashedTokenFeatures(docs, "doc_id", "text", 16)
    val df = graft.text.Classifier.docFeatures(feats, labels, "doc_id").localCheckpoint()
    try {
      val model = graft.text.Classifier.LinearModel(
        (0L until 16L).map(_ -> 7L).toMap, 11L)
      val p = graft.text.Classifier.score(df, "doc_id", model)
        .queryExecution.executedPlan.toString
      // the deployed-filter shape: weights are a dims-bounded literal map,
      // so scoring 100 TB is one scan — a join or shuffle here would put
      // the model on the data path
      assert(!p.contains("Exchange"), s"scoring must not shuffle:\n$p")
      assert(!p.contains("Join"), s"scoring must not plan a join:\n$p")
    } finally graft.Checkpoints.release(df)
  }

  test("reassign is a narrow projection over the assigned table: no exchange, no join") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = graft.similarity.Similarity.ivfIndex(emb, "vec_id", "embedding",
      numCentroids = 4)
    val cents = graft.similarity.Similarity.ivfCentroids(emb, "vec_id",
      "embedding", k = 3)
    val p = graft.similarity.Similarity.reassign(idx, "embedding", cents)
      .assigned.queryExecution.executedPlan.toString
    // re-routing scores numCentroids literals per row — a shuffle or join
    // here would mean the index table moved to re-derive a per-row column
    assert(!p.contains("Exchange"), s"reassign must not shuffle:\n$p")
    assert(!p.contains("Join"), s"reassign must not plan a join:\n$p")
  }

  test("q179 line dedup: hot lines broadcast, partial line counts, one doc re-assembly") {
    val p = plan("q179_line_dedup")
    // the >maxDf tail ships to executors — a shuffled line join would
    // move the whole exploded corpus AND concentrate the boilerplate key
    // skew the operator exists to remove
    assert(p.contains("BroadcastHashJoin"), s"hot set must broadcast:\n$p")
    // line counting partial-aggregates below its exchange (map-side
    // combine on the line key), so the shuffle carries distinct lines
    assert("partial_count".r.findFirstIn(p.toLowerCase).isDefined ||
      p.contains("HashAggregate(keys=[line"), s"line count must partial-aggregate:\n$p")
    // corpus-sized exchanges: the line-count aggregation and the doc
    // re-assembly (plus the graded orderBy's range exchange) — the
    // exploded corpus must not shuffle a third time for the join
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 2, s"expected line-count + reassembly shuffles only:\n$p")
  }
  test("packedDupsAgainst: banded equi-join, delta side broadcast, no cartesian") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // a delta-sized batch probing a corpus-sized fingerprint index — the
    // shape every packedDupIngest micro-batch plans
    val batch = (0L until 8L).map(i => (i, i * 0x9e3779b97f4a7c15L)).toDF("id", "sig")
    val corpus = (0L until 2000L).map(i => (i + 100L, i * 0x2545f4914f6cdd1dL))
      .toDF("id", "sig")
    val df = graft.dedup.Dedup.packedDupsAgainst(batch, corpus, "id", "sig", 3)
    df.collect() // AQE final plan
    val p = df.queryExecution.executedPlan.toString
    // the pigeonhole bands make this an EQUI-join on (band, bh): a
    // cartesian or nested-loop plan would compare every sig pair
    assert(!p.contains("CartesianProduct"), s"band probe must stay equi:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"band probe must stay equi:\n$p")
    // the batch side is delta-sized: AQE must broadcast it against the
    // index rather than shuffling the corpus fingerprints
    assert(p.contains("BroadcastHashJoin"), s"delta side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"the corpus side must not shuffle:\n$p")
  }
  test("q215 threshold sweep is one pass: label rides the margin projection, no join") {
    val p = plan("q215_classifier_sweep")
    // the label must ride THROUGH the scoring pass (score's keep param) —
    // joining it back by id would exchange the corpus a second time. The
    // one legitimate join (docFeatures' feats-labels build) sits BELOW
    // the threshold explode; nothing above it may join
    val genIdx = p.indexOf("Generate explode")
    assert(genIdx >= 0, s"expected the threshold explode:\n$p")
    assert(!p.substring(0, genIdx).contains("Join"),
      s"the sweep above the explode must not plan a join:\n$p")
    // one aggregate exchange on the 7-key threshold ladder, partial
    // counts below it (the explode collapses map-side)
    val partialIdx = p.indexOf("partial_count")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(threshold_micros")
    assert(partialIdx > exchangeIdx && exchangeIdx >= 0,
      s"expected partial counts under the threshold exchange:\n$p")
  }
  test("q218 per-source quantiles: (source, bucket) rank, offsets reuse, targets broadcast") {
    val df = SparkEntry.queries("q218_source_quantiles")(spark, dir)
    df.collect() // AQE materializes exchange reuse only in the FINAL plan
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // the rank must never run as one window partition per source (the
    // q100/q153 discipline): offsets branch reuses the ONE materialized
    // (source, __b) exchange, and the #keys-x-#probs target table joins
    // by broadcast
    assert("ReusedExchange.*hashpartitioning\\(source#\\d+, __b".r.findFirstIn(finalSection).isDefined,
      s"offsets branch must reuse the (source, bucket) exchange:\n$finalSection")
    assert("\\+- Exchange hashpartitioning\\(source#\\d+, __b".r.findAllIn(finalSection).size === 1,
      s"expected ONE materialized (source, bucket) exchange:\n$finalSection")
    assert(finalSection.contains("BroadcastHashJoin"), s"targets must broadcast:\n$p")
    assert(!finalSection.contains("SortMergeJoin"), p)
  }

  test("q222 scd2 apply: keyed joins over the open slice only, no corpus-global window") {
    val p = plan("q222_scd2_history")
    // the interval algebra must never rank or sort the whole history in
    // one task — SCD2 is keyed joins + a conditional explode
    assert(!p.contains("Window"), s"scd2Apply must not plan a window:\n$p")
    assert(!p.contains("SinglePartition"),
      s"no stage may funnel through one partition (the final orderBy is a range exchange):\n$p")
    assert(p.contains("Generate explode"), s"the 0-2-rows-per-key emit is one explode pass:\n$p")
  }

  test("q225 pit join: the dimension history broadcasts; interval predicate stays residual") {
    val df = SparkEntry.queries("q225_pit_join")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // facts (corpus-sized) must NOT shuffle to meet a dimension-sized
    // history: the PIT join is broadcast, keyed on the pk, with the
    // valid_from/valid_to range as a residual join condition
    assert(finalSection.contains("BroadcastHashJoin"), s"history must broadcast:\n$finalSection")
    assert("BroadcastHashJoin.*LeftOuter.*valid_from|valid_from.*<=".r.findFirstIn(finalSection).isDefined
      || finalSection.contains("valid_from"), s"interval predicate must ride the join:\n$finalSection")
    assert(!finalSection.contains("CartesianProduct"), p)
  }

  test("q226 url canonicalization is a pure narrow codegen projection over the scan") {
    val p = plan("q226_url_canonical")
    assert(!p.contains("Exchange hashpartitioning"),
      s"url normalization must not shuffle (the final orderBy is a range exchange):\n$p")
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint"), p)
    assert(!p.contains("text"), "the text column must be pruned from the scan")
  }

  test("q239 main-content extraction is a pure narrow pass: no shuffle, no join") {
    val p = plan("q239_main_content")
    // block segmentation + density scoring are per-row higher-order
    // expressions: at 100 TB this must fuse into the scan like q224/q226
    assert(!p.contains("Exchange hashpartitioning"),
      s"main-content must not shuffle (the final orderBy is a range exchange):\n$p")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
  }

  test("q251 WARC record split is narrow: no join, no keyed shuffle, no aggregate") {
    val p = plan("q251_warc_records")
    // one mapPartitions flatMap per file partition — files are the
    // parallelism unit; only the final orderBy's range exchange may appear
    assert(!p.contains("Exchange hashpartitioning"),
      s"the record split must not shuffle:\n$p")
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("q253 semantic decontamination broadcasts the BENCHMARK, never the corpus") {
    val p = plan("q253_embed_decontaminate")
    assert(p.contains("BroadcastExchange"), s"benchmark must broadcast:\n$p")
    // the corpus side carries the planted twin/negation id arithmetic
    // (+1000000/+2000000); the benchmark side (vec_id < 100) does not —
    // a broadcast subtree containing it would be the 100 TB side
    val buildSide = p.substring(p.indexOf("BroadcastExchange"))
    assert(!buildSide.contains("1000000"),
      s"corpus side must never be the broadcast build side:\n$p")
  }

  test("q255 cluster balance: assignment is shuffle-free, the cap is ONE keyed window") {
    val p = plan("q255_cluster_balance")
    val finalSection = p.split("== Initial Plan ==").head
    // nearest-centroid assignment is per-row scalar expressions (the
    // centroids are literals); the only keyed exchange is capPerKey's
    // window (the final orderBy is a range exchange)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(hashExchanges === 1, s"expected only the cap's keyed shuffle:\n$finalSection")
    assert(!finalSection.contains("Join"), finalSection)
  }

  test("q258 robots gate is a pure narrow projection: no join, no keyed shuffle") {
    val p = plan("q258_robots_gate")
    // the rules ride the RobotsDecision expression as a plan literal —
    // there is nothing to join; only the final orderBy range exchange
    assert(!p.contains("Join"), s"the decision must not plan a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the URL (100 TB) side must never shuffle:\n$p")
    assert(p.contains("robotsdecision"), s"expected the codegen'd decision:\n$p")
  }

  test("q268/q269/q270 chat folds are pure narrow projections: zero keyed shuffles") {
    // the SFT family's scale claim: render and spans both live in ONE
    // higher-order aggregate per row — a per-conversation window would
    // plan a hashpartitioning exchange on the conversation id
    for (q <- Seq("q268_chat_render", "q269_chat_loss_spans",
                  "q270_chat_fit_budget")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not shuffle the corpus (the fold owns the offset):\n$p")
      assert(!p.contains("Window"), s"$q must not plan a window:\n$p")
    }
  }

  test("q272/q273 lint and sitemap folds are pure narrow projections: zero keyed shuffles") {
    // the lint is the q268 fold shape; the sitemap parser is the
    // outlinks shape — both fuse into the scan at 100 TB
    for (q <- Seq("q272_chat_lint", "q273_sitemap_entries")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not shuffle the corpus:\n$p")
      assert(!p.contains("Window"), s"$q must not plan a window:\n$p")
      assert(!p.contains("Join"), s"$q must not plan a join:\n$p")
    }
  }

  test("q271 preference mining: ONE prompt-keyed exchange with partial max_by/min_by below it") {
    val p = plan("q271_preference_pairs")
    // the mining rule is a single aggregation — each map task ships one
    // candidate pair per prompt, not its rollouts; a window or self-join
    // formulation would shuffle the rollout table whole (or twice)
    assert(!p.contains("Window"), s"best/worst must not plan a window:\n$p")
    assert(!p.contains("Join"), s"best/worst must not self-join:\n$p")
    // both sides are min_by under inverted/plain keys (no id arithmetic
    // — string ids must tie-break identically on both sides)
    val partialIdx = p.indexOf("partial_min_by")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected map-side partial min_by below the prompt exchange:\n$p")
    // exactly one keyed exchange: the prompt key
    assert(p.indexOf("Exchange hashpartitioning", exchangeIdx + 1) < 0,
      s"expected ONE keyed exchange:\n$p")
  }

  test("q278 bitext mining: one broadcast cross pass, windows on the scored stream only") {
    val p = plan("q278_bitext_mine")
    // the b corpus broadcasts into the a scan (the q112 exact-baseline
    // convention) — a shuffled cartesian over both corpora would be the
    // wrong plan at any scale
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the smaller corpus must broadcast into one cross pass:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"never a shuffled cartesian:\n$p")
  }

  test("q277 token mask: narrow projection around the codegen'd token positions") {
    val p = plan("q277_token_loss_mask")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the mask must not shuffle the corpus:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"span→token translation is per-row array arithmetic:\n$p")
    assert(p.contains("tokenspans"),
      s"expected the codegen'd token-position expression:\n$p")
  }

  test("q275 group advantages: one prompt exchange feeding one Window, no join") {
    val p = plan("q275_group_advantage")
    // per-rollout output with group stats attached: the window IS the
    // right shape here (q271's aggregation emits per-prompt rows) — but
    // count/sum/sumsq must share ONE partition spec, and an agg+rejoin
    // formulation would shuffle twice
    assert(!p.contains("Join"), s"group stats must not plan a rejoin:\n$p")
    val firstW = p.indexOf("Window")
    assert(firstW >= 0, s"expected a Window node:\n$p")
    assert(p.indexOf("Window", firstW + 1) < 0,
      s"count/sum/sumsq must share ONE Window:\n$p")
    val firstX = p.indexOf("Exchange hashpartitioning")
    assert(firstX >= 0 && p.indexOf("Exchange hashpartitioning", firstX + 1) < 0,
      s"expected ONE keyed exchange:\n$p")
  }

  test("q261 join-form robots gate: rules join host-keyed, never collect into a literal") {
    val p = plan("q261_robots_gate_join")
    // the scale shape IS the gate: a real host-keyed join (the mega-host
    // escape the plan-literal form cannot give), the decision running
    // against the row's joined rule array
    assert(p.contains("Join"), s"the join twin must plan a join:\n$p")
    assert(p.contains("robotsdecisionarray"),
      s"expected the codegen'd array decision:\n$p")
    // no rules literal: RobotsDecision prints its rules map inline, so a
    // literal-form leak would surface the planted pattern text in the plan
    assert(!p.contains("robotsdecision("),
      s"the literal-form expression must not appear:\n$p")
  }

  test("videoSignature: keyframe windows and the signature fold share ONE doc exchange") {
    import org.apache.spark.sql.functions._
    val frames = spark.range(200).select(
      (col("id") / 10).cast("long").as("doc_id"),
      (col("id") % 10).as("frame_idx"),
      ((col("id") % 7) * 40000 + 16000).as("mean_milli_gray"))
    val df = graft.multimodal.Multimodal.videoSignature(frames, 15000L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // two per-video windows + the per-video aggregate all key on doc_id:
    // one hash exchange feeds them all — a second would mean the window
    // and the fold stopped sharing partitioning
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(hashExchanges === 1, s"expected one doc-keyed shuffle:\n$finalSection")
    assert(!finalSection.contains("SinglePartition"),
      s"no corpus-global window allowed:\n$finalSection")
  }
}
