package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset curation operators for training-data pipelines: deterministic
  * splits and per-group caps.
  *
  * Both are narrow/one-shuffle plans: the split is a pure hash expression
  * (no shuffle at all — splits can be computed inline in any scan), the cap
  * is one keyed window shuffle. Neither uses rand(): every decision is a
  * function of the DATA, so re-running on a grown corpus keeps previous
  * rows in their previous split (stable membership — the property cluster
  * re-runs at 100 TB actually need; rand() would reshuffle everything and
  * leak test documents into training between runs).
  */
object Sampling {

  /** Deterministic split bucket in [0, 100) from a stable id column —
    * xxhash64-based, uncorrelated with id magnitude or insertion order
    * (plain `id % 100` biases against range-partitioned or striped ids). */
  def splitBucket(idCol: Column): Column = pmod(xxhash64(idCol), lit(100))

  /** Tag each row 'train'/'test' with ~trainPct% in train — stable under
    * corpus growth (a row's split never changes when other rows appear). */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int,
                splitCol: String = "split"): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct in (0,100), got $trainPct")
    df.withColumn(splitCol,
      when(splitBucket(col(idCol)) < trainPct, lit("train")).otherwise(lit("test")))
  }

  /** LEAKAGE-SAFE split: [[hashSplit]]'s stable assignment, but rows
    * connected by `pairs` (near-duplicates — MinHash, SimHash, embedding
    * pairs, any symmetric relation) ALWAYS land in the same split. A plain
    * per-row hash split puts ~20% of each near-dup cluster in test while
    * its twins sit in train — the classic eval-leakage bug: the model is
    * "evaluated" on paraphrases of its own training data. Here the split
    * is keyed on each row's connected-component canonical id
    * (`Dedup.connectedComponents` — delayed pointer jumping, O(log
    * diameter) rounds), so a cluster moves as a unit and the unit of
    * accounting matches the unit of information.
    *
    * The bucket is the md5 hex digest of `salt + ":" + canon` compared
    * lexicographically against two fixed-width hex prefixes — train below
    * `trainHex`, val below `valHex`, test above. Hex-prefix thresholds
    * make the assignment a pure deterministic function of (salt, canon)
    * that any engine reproduces from the same string digest (the q106
    * shardedShuffle convention); "c0"/"e0" give 75/12.5/12.5. Stable
    * under corpus growth ONLY while a cluster's canonical is stable —
    * adding a doc that bridges two clusters merges them and can move the
    * merged cluster's rows; that is inherent to group-aware splitting,
    * not an implementation artifact (the alternative — freezing old
    * assignments — reintroduces the leak through the bridge).
    *
    * Cost: the CC rounds over the PAIRS graph (edges, not the corpus;
    * near-dup graphs are sparse by construction) plus one broadcast-size
    * join of (id, canon) back to `df` when the pair set is small, a
    * shuffled equi-join otherwise — AQE picks. Output: `df`'s columns +
    * (canon, splitCol). */
  def groupSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                 salt: String = "graft-split", trainHex: String = "c0",
                 valHex: String = "e0", splitCol: String = "split"): DataFrame = {
    require(trainHex < valHex,
      s"need trainHex < valHex, got '$trainHex' >= '$valHex'")
    val canon = graft.dedup.Dedup.connectedComponents(df.select(col(idCol)), idCol, pairs)
      .select(col("id").as(idCol), col("canon"))
    val h = md5(concat(lit(salt + ":"), col("canon").cast("string")).cast("binary"))
    df.join(canon, Seq(idCol))
      .withColumn(splitCol,
        when(h < trainHex, lit("train"))
          .when(h < valHex, lit("val"))
          .otherwise(lit("test")))
  }

  /** Keep at most `n` rows per key, chosen by `order` (deterministic — make
    * it a total order within a key or ties pick arbitrarily): the
    * "at most N documents per source/domain" curation cap. One keyed window
    * shuffle; skew-bounded by the hottest key. */
  def capPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Embedding-CLUSTER-balanced curation cap — the SemDeDup-adjacent
    * diversity-balancing stage production mixtures run: assign every row
    * to its nearest centroid (the IVF assignment —
    * [[graft.similarity.Similarity.assignToCentroid]]'s argmin with the
    * deterministic lowest-cid tie-break; train centroids offline with
    * `ivfCentroids` over a sample, or state them) and keep at most `n`
    * rows per cluster by `order` — a topic flood that would dominate the
    * mixture flattens to the cap while sparse topics pass through whole.
    * Output carries the assignment as `cluster` (the audit column a
    * release report groups by). Plan: numCentroids scalar expressions per
    * row (no shuffle for the assignment — centroids ride the closure as
    * literals exactly as in `knnJoinIvf`) + [[capPerKey]]'s one keyed
    * window shuffle, skew-bounded by the hottest cluster. For rate-based
    * flattening instead of a hard cap, `temperatureRates` composes the
    * same way on the `cluster` column. */
  def clusterCap(emb: DataFrame, idCol: String, vecCol: String,
                 cents: Array[(Int, Array[Float])], n: Int,
                 order: Seq[Column] = Seq.empty): DataFrame = {
    val assigned = graft.similarity.Similarity.assignToCentroid(emb, vecCol, cents)
      .withColumnRenamed("__centroid", "cluster")
    capPerKey(assigned, Seq("cluster"),
      if (order.nonEmpty) order else Seq(col(idCol)), n)
  }

  /** Quantile-stratified sampling: rank rows into `nStrata` equal-size
    * strata by `order` (ntile — SQL-standard: ceil(n/k) rows in the first
    * n mod k strata, so a TOTAL order makes membership deterministic and
    * engine-portable), then keep the first `perStratum` rows of each
    * stratum by the same order. The "sample uniformly across the length
    * distribution" curation step — a plain `LIMIT k` would sample only the
    * head of the distribution.
    *
    * With `bucket` (an expression order-consistent with `order` — the
    * [[PrefixSum]] contract), BOTH windows of the naive formulation
    * disappear into the bucket decomposition: the exact global rank is
    * the inclusive running COUNT over the total order
    * ([[PrefixSum.globalRunningSum]] of a ones column — one (bucket)-keyed
    * exchange, per-bucket parallel windows, a |buckets|-sized broadcast of
    * exclusive offsets), and because SQL ntile strata are contiguous RANK
    * RANGES, both the stratum id and the within-stratum row number are
    * pure integer expressions of (rank, total): with q = n div k,
    * rem = n mod k, cut = rem·(q+1),
    *   stratum = rank <= cut ? (rank-1) div (q+1) + 1
    *                         : rem + (rank-cut-1) div q + 1
    *   start(stratum) = stratum <= rem ? (stratum-1)·(q+1) + 1
    *                                   : cut + (stratum-rem-1)·q + 1
    * and a row survives iff rank < start + perStratum. The per-stratum
    * row_number window of the naive plan — nStrata is SMALL, so it
    * funnels each stratum through one task — is gone entirely; the only
    * extra cost is one narrow partial-aggregated count() for n. All
    * arithmetic is exact integer math on longs: membership is bit-stable
    * and engine-portable (graded against DuckDB's own ntile — q69).
    *
    * `None` keeps the single-window exact form: ntile over a global order
    * funnels the ranking through one partition — only right at
    * profile/report scale, never for corpus-sized inputs.
    *
    * The bucketed path's single-scan exchange reuse REQUIRES a narrow
    * input (every column participates in `order` — the
    * [[PrefixSum.keyedRunningSum]] contract); project first and join
    * payload back by id. */
  def strataSample(df: DataFrame, order: Seq[Column], nStrata: Int,
                   perStratum: Int, stratumCol: String = "stratum",
                   bucket: Option[Column] = None): DataFrame = {
    require(nStrata > 0 && perStratum > 0,
      s"need nStrata > 0 and perStratum > 0, got $nStrata/$perStratum")
    bucket match {
      case Some(b) =>
        val reserved = Seq("__one", "__rank", stratumCol)
        val clash = df.columns.toSeq.intersect(reserved)
        require(clash.isEmpty,
          s"strataSample: input columns ${clash.mkString(", ")} collide with " +
            "internal/output names — rename them first")
        val n = df.count()
        val k = nStrata.toLong
        val q = n / k
        val rem = n % k
        val cut = rem * (q + 1)
        // q = 0 (n < k) makes the ELSE branches unreachable (cut = n covers
        // every rank) — max(q, 1) keeps the constant-side divisor nonzero
        val qSafe = math.max(q, 1L)
        PrefixSum.globalRunningSum(df.withColumn("__one", lit(1L)), "__one", b, order)
          .withColumnRenamed("running___one", "__rank")
          .withColumn(stratumCol, expr(
            s"CAST(CASE WHEN __rank <= $cut THEN (__rank - 1) div ${q + 1} + 1 " +
              s"ELSE $rem + (__rank - $cut - 1) div $qSafe + 1 END AS BIGINT)"))
          .filter(expr(
            s"__rank < (CASE WHEN `$stratumCol` <= $rem THEN (`$stratumCol` - 1) * ${q + 1} + 1 " +
              s"ELSE $cut + (`$stratumCol` - $rem - 1) * $qSafe + 1 END) + $perStratum"))
          .drop("__one", "__rank")
      case None =>
        val w = Window.orderBy(order: _*)
        df.withColumn(stratumCol, ntile(nStrata).over(w).cast("long"))
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col(stratumCol)).orderBy(order: _*)))
          .filter(col("__rn") <= perStratum)
          .drop("__rn")
    }
  }

  /** EXACT discrete quantiles at corpus scale — the value at rank
    * ceil(p·n) of the total order (`valueCol`, `idCol`), which is
    * SQL/DuckDB `quantile_disc` semantics exactly (probed and pinned:
    * idx = ceil(p·n) clamped >= 1, integer permille arithmetic
    * (p_pm·n + 999) div 1000 so no float rounding can move a boundary).
    * `approx_percentile` trades exactness for one pass; a naive exact
    * formulation sorts the corpus through ONE partition. This is the
    * third use of the q106/q69 bucket decomposition: the exact global
    * rank comes from [[PrefixSum.globalRunningSum]] over a ones column
    * (one bucket-keyed exchange + a |buckets|-sized offsets broadcast),
    * the target ranks are #probs literals broadcast back, and the
    * result is one narrow filter — the corpus never converges on a
    * single task. Length-bucketing for batch inference, data-card
    * percentile lines, and drift thresholds all want THIS (exact,
    * engine-portable) rather than the approximate sketch.
    *
    * `bucket` must be order-consistent with `valueCol` (the [[PrefixSum]]
    * contract); ties on the value are broken by `idCol`, which cannot
    * change the value AT a rank. Output: (prob_pm, value), one row per
    * requested permille (duplicate targets each get their row). */
  def exactQuantiles(df: DataFrame, valueCol: String, idCol: String,
                     bucket: Column, probsPermille: Seq[Long]): DataFrame = {
    require(probsPermille.nonEmpty, "exactQuantiles: empty probs")
    require(probsPermille.forall(p => p >= 0 && p <= 1000),
      s"exactQuantiles: probs are permille in [0, 1000], got $probsPermille")
    val reserved = Set("prob_pm", "value", "__rank", "__one", "__t", "__n")
    require(!reserved(valueCol) && !reserved(idCol),
      s"exactQuantiles: value/id columns collide with internal/output names " +
        s"(${reserved.mkString(", ")}) — rename them first")
    val spark = df.sparkSession
    val n = df.count()
    val targets = probsPermille.map(p =>
      (p, math.max(1L, (p * n + 999L) / 1000L)))
    val ranked = PrefixSum.globalRunningSum(
        df.select(col(valueCol), col(idCol)).withColumn("__one", lit(1L)),
        "__one", bucket, Seq(col(valueCol), col(idCol)))
      .withColumnRenamed("running___one", "__rank")
    import spark.implicits._
    ranked.join(broadcast(targets.toDF("prob_pm", "__t")),
        col("__rank") === col("__t"))
      .select(col("prob_pm"), col(valueCol).as("value"))
  }

  /** PER-KEY [[exactQuantiles]] — the data-card percentile line computed
    * per source/domain ("p50/p90 length per source") with the SAME
    * ceil(p·n_k) discrete semantics per key. Keys are dashboard-sized
    * (sources, not documents), so a plain per-key sort window would
    * single-task a 10 TB source — the rank routes through
    * [[PrefixSum.keyedRunningSum]]'s (key, bucket) decomposition instead,
    * and the per-key target-rank table (#keys × #probs rows, from one
    * narrow partial-aggregated count scan) broadcasts back onto a
    * using-columns equi-join. Output: keys ++ (prob_pm, value). */
  def exactQuantilesByKey(df: DataFrame, valueCol: String, idCol: String,
                          keys: Seq[String], bucket: Column,
                          probsPermille: Seq[Long]): DataFrame = {
    require(keys.nonEmpty, "exactQuantilesByKey: empty keys — use exactQuantiles")
    require(probsPermille.nonEmpty, "exactQuantilesByKey: empty probs")
    require(probsPermille.forall(p => p >= 0 && p <= 1000),
      s"exactQuantilesByKey: probs are permille in [0, 1000], got $probsPermille")
    val reserved = Set("prob_pm", "value", "__rank", "__one", "__t", "__n")
    require((keys :+ valueCol :+ idCol).forall(c => !reserved(c)),
      s"exactQuantilesByKey: keys/value/id columns collide with internal/" +
        s"output names (${reserved.mkString(", ")}) — rename them first")
    val kc = keys.map(col)
    val targets = df.groupBy(kc: _*).agg(count(lit(1)).as("__n"))
      .select(kc :+ explode(typedLit(probsPermille)).as("prob_pm") :+ col("__n"): _*)
      .select(kc :+ col("prob_pm") :+
        greatest(lit(1L), expr("(prob_pm * __n + 999) div 1000")).as("__rank"): _*)
    val ranked = PrefixSum.keyedRunningSum(
        df.select(kc :+ col(valueCol) :+ col(idCol): _*).withColumn("__one", lit(1L)),
        "__one", keys, bucket, Seq(col(valueCol), col(idCol)))
      .withColumnRenamed("running___one", "__rank")
    ranked.join(broadcast(targets), keys :+ "__rank")
      .select(kc :+ col("prob_pm") :+ col(valueCol).as("value"): _*)
  }

  /** Data-mixture sampling: keep each row with its source's rate — the
    * "10% web, 100% books, 3× upsampled code" recipe of every pretraining
    * mix, as one deterministic narrow filter (rates <= 1; upsampling is a
    * separate explode). A row is kept iff
    * pmod(xxhash64(id), 1_000_000) < rate(source) * 1e6, so membership is
    * a pure function of the row (stable under corpus growth, retry-safe,
    * no rand()), per-source fractions concentrate tightly at any real
    * scale, and a source absent from `rates` defaults to `defaultRate`.
    * No shuffle: the filter composes into whatever scan precedes it. */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      s"rates must be in [0,1]: $rates default=$defaultRate")
    val threshold = rates.foldLeft(lit((defaultRate * 1e6).toLong)) {
      case (acc, (src, rate)) =>
        when(col(sourceCol) === src, lit((rate * 1e6).toLong)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(col(idCol)), lit(1000000L)) < threshold)
  }

  /** Temperature-flattened mixture rates — the multilingual/multi-domain
    * rebalance every pretraining mix applies: rate_s = (n_s / n_max)^α,
    * so the LARGEST source samples at 1.0 and smaller sources are
    * relatively upweighted (α = 1 reproduces natural proportions, α → 0
    * approaches uniform; α = 0.5 is the standard sqrt flattening). Rates
    * land in (0, 1] by construction — directly feedable to
    * [[mixtureSample]], whose contract caps rates at 1. One partial
    * aggregate over the corpus (source-count rows) + a broadcast of the
    * single max — nothing driver-side grows with the data.
    *
    * Determinism: n_s / n_max and sqrt are correctly-rounded IEEE ops on
    * exactly-representable integer counts, so the α = 0.5 path is
    * bit-identical across engines (graded — q137). Other α go through
    * pow(), whose last ulp may differ between libm implementations —
    * fine for sampling, not for hash-equality gates. */
  def temperatureRates(df: DataFrame, sourceCol: String,
                       alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
    val ratio = col("n_docs").cast("double") / col("__max").cast("double")
    counts
      .crossJoin(broadcast(counts.agg(max(col("n_docs")).as("__max"))))
      .withColumn("rate",
        if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(alpha)))
      .select(col(sourceCol), col("n_docs"), col("rate"))
  }

  /** Deterministic upsampling / epoch scheduling — the "3× upsampled
    * code" half of the mixture recipe that [[mixtureSample]]'s doc
    * defers to "a separate explode": each row is replicated
    * `repeats(source)` times with an `epoch` index (0-based), so a
    * high-quality source can be walked multiple epochs per pass while
    * provenance (which copy is which) stays joinable. Zero repeats drop
    * the source entirely. A narrow per-row explode — output size is the
    * recipe's own blow-up factor, nothing shuffles. Downstream,
    * [[shardedShuffle]] keyed on (id, epoch) interleaves the copies
    * through the training order instead of replaying them butt-to-butt. */
  def epochExpand(df: DataFrame, sourceCol: String, repeats: Map[String, Int],
                  defaultRepeats: Int = 1): DataFrame = {
    require((repeats.values ++ Seq(defaultRepeats)).forall(_ >= 0),
      s"repeats must be >= 0: $repeats default=$defaultRepeats")
    // the appended column must not shadow an existing one — re-expanding
    // already-expanded data would otherwise die on an ambiguous reference
    require(!df.columns.exists(_.equalsIgnoreCase("epoch")),
      "epochExpand: input already has an 'epoch' column — drop or rename it " +
        "(re-expanding expanded data multiplies copies; that is rarely intended)")
    val r = repeats.foldLeft(lit(defaultRepeats)) {
      case (acc, (src, n)) => when(col(sourceCol) === src, lit(n)).otherwise(acc)
    }
    df.select(df.columns.map(col) :+
        posexplode(array_repeat(lit(1), r)).as(Seq("epoch", "__one")): _*)
      .withColumn("epoch", col("epoch").cast(LongType))
      .drop("__one")
  }

  /** Token-budget sampling: within each key, take rows in `order` until
    * the running total of `weightCol` exceeds `budget` — how a
    * pretraining mixture is actually assembled ("2B tokens of web, 500M
    * of code"), where the unit of account is tokens, not documents.
    * A row is kept iff its running-sum-INCLUSIVE total is <= budget, so
    * the result never overshoots; the first over-budget row is dropped
    * (no partial documents — truncation is a separate chunking concern).
    * Make `order` a total order within a key or membership is
    * tie-dependent.
    *
    * Scale shape: `keys` here are SOURCES — low-cardinality (~10 at
    * 100 TB) — so a plain per-key window would funnel each source's
    * entire token stream through ONE task. With `bucket` (an expression
    * order-consistent with `order` within each key, e.g. a div of the
    * ordering id — the [[PrefixSum]] contract), the running sum routes
    * through [[PrefixSum.keyedRunningSum]]'s bucket decomposition: the
    * exchange key is (key, bucket) and a 10 TB source splits across its
    * buckets in parallel. `None` keeps the single per-key window — only
    * right when keys are HIGH-cardinality (doc-keyed), never for
    * source-keyed budgets at scale. The bucketed path's single-scan
    * exchange reuse REQUIRES a narrow input (keys + order + weight and
    * nothing else — the keyedRunningSum contract); keep payload columns
    * out and join them back by id, or pass `aggOffsets = true` to trade
    * the reuse for an independent partial-aggregated offsets scan that
    * tolerates payload (the packedWindows mode).
    *
    * PRECONDITION: weights must be non-null and non-negative — the running
    * sum skips NULLs (a null-weight row would ride free) and a negative
    * weight can re-admit rows after the first over-budget row, both
    * violating the prefix rule. Token/byte counts satisfy this trivially;
    * coalesce or filter anything else first. */
  def tokenBudgetSample(df: DataFrame, keys: Seq[String], order: Seq[Column],
                        weightCol: String, budget: Long,
                        bucket: Option[Column] = None,
                        aggOffsets: Boolean = false): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    bucket match {
      case Some(b) =>
        PrefixSum.keyedRunningSum(df, weightCol, keys, b, order, aggOffsets)
          .filter(col(s"running_$weightCol") <= budget)
          .drop(s"running_$weightCol")
      case None =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("__cum", sum(col(weightCol)).over(w))
          .filter(col("__cum") <= budget)
          .drop("__cum")
    }
  }

  /** TOKEN-BALANCED sharding — write-side balance for training shards:
    * assign each document a shard id so every shard carries ~equal TOKEN
    * mass, where [[graft.operators.PrefixSum]]-less hash sharding (q106)
    * balances ROW COUNTS — wrong when doc lengths are skewed (a shard of
    * long docs trains slower than its siblings and stragglers the epoch).
    * Deterministic greedy rule: docs in the global `order`, shard =
    * exclusive-cumulative-tokens div ceil(total/nShards), clamped to
    * nShards−1 (floor rounding can spill a one-doc sliver past the last
    * boundary). A document is never split (chunking is upstream) so
    * shards balance to within one document's tokens.
    *
    * Scale shape: the global cumulative sum runs through
    * [[PrefixSum.globalRunningSum]] — the bucket-decomposed parallel
    * prefix sum, never a single-partition window (`bucket` must be
    * order-consistent with `order`, the PrefixSum contract); the total
    * is one scalar agg. Appends `shard` to the input columns. */
  def tokenBalancedShards(df: DataFrame, tokensCol: String,
                          bucket: Column, order: Seq[Column],
                          nShards: Int): DataFrame = {
    require(nShards >= 1, s"tokenBalancedShards: nShards must be >= 1, got $nShards")
    require(!df.columns.exists(_.equalsIgnoreCase("shard")),
      "tokenBalancedShards: input already has a 'shard' column")
    val total = df.agg(coalesce(sum(col(tokensCol)), lit(0L)).cast(LongType))
      .head.getLong(0)
    val target = math.max(1L, (total + nShards - 1) / nShards)
    PrefixSum.globalRunningSum(df, tokensCol, bucket, order)
      .withColumn("shard",
        least(lit(nShards - 1L),
          expr(s"(running_$tokensCol - `$tokensCol`) div $target"))
          .cast(LongType))
      .drop(s"running_$tokensCol")
  }

  /** WATER-FILLING budget allocation — the Pile/Dolma mixture-assembly
    * rule [[tokenBudgetSample]] feeds from: split a TOTAL token budget
    * across sources by target weights, and when a source is too small to
    * absorb its share (alloc >= its total tokens), it takes everything it
    * has and the SHORTFALL REDISTRIBUTES to the remaining sources by
    * their weights — iterating until no source exhausts. Without this, a
    * "10% code" target quietly becomes 3% when the code source is small
    * and the freed budget evaporates instead of flowing to other sources.
    *
    * Pure driver integer arithmetic over source-level rows (#sources is
    * dashboard-sized — this is the k-centroids collect shape, never
    * corpus-sized): each round fixes every active source whose
    * floor(B_rem * w / W_active) share covers its total, then recomputes;
    * E only grows, so <= #sources rounds. Floors throughout (both
    * engines' integer division), so the allocation replays exactly in a
    * generated DuckDB CTE chain (q192). Zero-weight actives allocate 0
    * (and a zero-weight source with zero tokens counts as exhausted);
    * if every source exhausts, the whole corpus is the mixture and any
    * leftover budget is unfilled — deterministic, reported by the caller
    * comparing Σ alloc to budget.
    *
    * Input: (source, weight, totalTokens) rows; output: (source, alloc,
    * exhausted). */
  def budgetAllocations(perSource: Seq[(String, Long, Long)],
                        budget: Long): Seq[(String, Long, Boolean)] = {
    require(budget >= 0, s"budgetAllocations: budget must be >= 0, got $budget")
    require(perSource.forall { case (_, w, t) => w >= 0 && t >= 0 },
      "budgetAllocations: weights and totals must be >= 0")
    require(perSource.map(_._1).distinct.length == perSource.length,
      "budgetAllocations: duplicate source rows")
    var exhausted = Set.empty[String]
    var done = false
    var shares = Map.empty[String, Long]
    while (!done) {
      val bRem = budget - perSource.collect {
        case (s, _, t) if exhausted(s) => t }.sum
      val active = perSource.filterNot(p => exhausted(p._1))
      val wAct = active.map(_._2).sum
      shares = active.map { case (s, w, _) =>
        s -> (if (wAct == 0) 0L else bRem * w / wAct) }.toMap
      val newly = active.collect {
        case (s, _, t) if shares(s) >= t => s }
      if (newly.isEmpty) done = true else exhausted ++= newly
    }
    perSource.map { case (s, _, t) =>
      if (exhausted(s)) (s, t, true) else (s, shares(s), false) }
  }

  /** The end-to-end mixture: [[budgetAllocations]] over the per-source
    * totals of `tokensCol`, then [[tokenBudgetSample]]'s greedy-prefix
    * rule per source under each source's own allocation (docs in
    * `orderCol` order while the INCLUSIVE running total fits; the first
    * over-budget doc is dropped — no partial documents). `weights` maps
    * source -> target weight, absent sources get `defaultWeight`.
    *
    * Plan: ONE narrow pass aggregates per-source totals (partial-combined,
    * #sources rows to the driver), the allocation loop is driver-side
    * integer arithmetic on those rows, and selection is one running-sum
    * pass with the allocation riding as a #sources-bounded literal map
    * — two passes over (source, order, tokens) total, nothing else moves.
    * `bucket` (order-consistent with `orderCol` within each source)
    * routes the selection sum through [[PrefixSum.keyedRunningSum]]'s
    * bucket decomposition — sources are low-cardinality, so the plain
    * per-source window would single-task a 10 TB source (the
    * [[tokenBudgetSample]] scale note, verbatim — including its
    * narrow-input/`aggOffsets` exchange-reuse contract). */
  def budgetMixture(df: DataFrame, sourceCol: String, orderCol: String,
                    tokensCol: String, weights: Map[String, Long],
                    budget: Long, defaultWeight: Long = 0L,
                    bucket: Option[Column] = None,
                    aggOffsets: Boolean = false): DataFrame = {
    require(defaultWeight >= 0, s"defaultWeight must be >= 0, got $defaultWeight")
    val per = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).cast(LongType).as("__t"))
      .collect()
      .map(r => (r.getString(0),
        weights.getOrElse(r.getString(0), defaultWeight), r.getLong(1)))
      .toSeq.sortBy(_._1)
    val alloc = budgetAllocations(per, budget)
      .map { case (s, a, _) => s -> a }.toMap
    val allocFor = element_at(typedLit(alloc), col(sourceCol))
    bucket match {
      case Some(b) =>
        PrefixSum.keyedRunningSum(df, tokensCol, Seq(sourceCol), b,
            Seq(col(orderCol)), aggOffsets)
          .filter(col(s"running_$tokensCol") <= allocFor)
          .drop(s"running_$tokensCol")
      case None =>
        val w = Window.partitionBy(col(sourceCol)).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("__cum", sum(col(tokensCol)).over(w))
          .filter(col("__cum") <= allocFor)
          .drop("__cum")
    }
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis–
    * Spirakis A-ES, IPL 2006): per row draw u ~ Uniform(0,1] and keep
    * the k rows per group with the largest key u^(1/w) — provably
    * equivalent to sequential weighted draws without replacement. The
    * quality-weighted curation pick ("sample 10k docs per source,
    * longer/higher-scoring docs proportionally more likely") that plain
    * Bernoulli mixture sampling ([[mixtureSample]]) cannot express: it
    * has no exact-k and no weights.
    *
    * Determinism and cross-engine grading: u derives from
    * md5(seed:id) — first 13 hex digits (52 bits, exactly a double) over
    * 2^52 — the same cross-engine-hash trick as [[shardedShuffle]], so
    * the sample is a pure function of (seed, id, w): stable across runs,
    * engines, layouts (`rand()` is none of those). Rows are ranked by
    * ln(u)/w, monotone with u^(1/w) (both strictly increasing in u for
    * w > 0) without the second transcendental; u clamps to >= 1e-300 so
    * the 2^-52 u=0 corner cannot hit ln's domain edge (Spark would NULL,
    * DuckDB -inf — divergent). ln is the one transcendental: engines may
    * differ in its last ulp, so adjacent-rank decisions carry the q140
    * measured-margin argument (hash-uniform keys — near-ties are
    * vanishingly unlikely; measured min adjacent RELATIVE margin across
    * every graded group's top-(k+1) is 2.1e-3 at sf0.01 and 2.6e-3 at
    * sf0.1 — thirteen orders above ln's ~1e-16 relative ulp).
    *
    * Rows with NULL or non-positive weight are EXCLUDED (A-ES is
    * undefined there; a zero-weight row must never be drawn), and so are
    * NULL ids (no md5 key — they would all clamp to one u and tie, and
    * the NULL tie-break diverges cross-engine; the [[shardedShuffle]]
    * rule). Ids must be DISTINCT within a group — duplicate ids share a
    * key exactly and the rank between them is partition-order-dependent,
    * breaking reproducibility (the shardedShuffle precondition). One
    * keyed window shuffle — the [[capPerKey]] cost envelope. Output:
    * input columns + `sample_rank` (1..k per group).
    *
    * `keys = Seq.empty` samples over the WHOLE corpus — and never as one
    * corpus-sized single-partition window: the [[shardedShuffle]]/q153
    * bucket decomposition applies directly because a global top-k is the
    * top-k of the union of per-bucket top-k's under ANY row bucketing.
    * Rows bucket by the first md5 hex byte of the key hash already
    * computed for u (256-way, uniform by construction), each bucket
    * keeps its own k best in a parallel keyed window, and one final
    * window re-ranks only the <= 256·k survivors — bounded like the
    * q106 offset window (sample-sized, never corpus-sized). Same total
    * (ln(u)/w DESC, id) order, so the global result is row-identical to
    * the degenerate one-window formulation (graded — q162 against the
    * same DuckDB A-ES oracle un-partitioned). */
  def weightedSample(df: DataFrame, keys: Seq[String], idCol: String,
                     weightCol: Column, k: Int, seed: String): DataFrame = {
    require(k >= 1, s"weightedSample: k must be >= 1, got $k")
    // case-INSENSITIVE: Spark resolves withColumn case-insensitively by
    // default, so a "SAMPLE_RANK" input column would still be clobbered
    require(!df.columns.exists(_.equalsIgnoreCase("sample_rank")),
      "weightedSample: input already has a 'sample_rank' column — " +
        "re-sampling a sample artifact would silently clobber it")
    // the global (keys = none) path materializes __rk/__b/__r working
    // columns and drops them at the end — an input column with one of
    // those names would be silently clobbered AND removed from the output
    if (keys.isEmpty) {
      val internal = Seq("__rk", "__b", "__r")
      require(!df.columns.exists(c => internal.exists(_.equalsIgnoreCase(c))),
        "weightedSample: input columns collide with the global path's " +
          "__rk/__b/__r working columns — rename them before sampling")
    }
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string"))
      .cast("binary"))
    val u = greatest(
      conv(substring(key, 1, 13), 16, 10).cast("double")
        / lit(4503599627370496.0),
      lit(1e-300))
    val filtered =
      df.filter(col(idCol).isNotNull && weightCol.isNotNull && weightCol > 0)
    if (keys.nonEmpty) {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy((log(u) / weightCol).desc, col(idCol))
      filtered.withColumn("sample_rank", row_number().over(w).cast("long"))
        .filter(col("sample_rank") <= k)
    } else {
      val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
      // the A-ES rank key is materialized as a column BEFORE the bucket
      // shuffle so the hash + transcendental evaluate once per row
      val bucketed = filtered
        .withColumn("__rk", log(u) / weightCol)
        .withColumn("__b", conv(substring(key, 1, 2), 16, 10).cast("int"))
        .repartition(n, col("__b"))
      val perBucket = Window.partitionBy(col("__b"))
        .orderBy(col("__rk").desc, col(idCol))
      val survivors = bucketed
        .withColumn("__r", row_number().over(perBucket))
        .filter(col("__r") <= k)
      // final ranking over <= 256·k rows — the bucket decomposition's
      // bounded merge step, not a corpus-sized window
      val wAll = Window.orderBy(col("__rk").desc, col(idCol))
      survivors.withColumn("sample_rank", row_number().over(wAll).cast("long"))
        .filter(col("sample_rank") <= k)
        .drop("__rk", "__b", "__r")
    }
  }

  /** Deterministic global corpus shuffle + contiguous shard/position
    * assignment — the training-order step: every row gets a pseudo-random
    * but reproducible global rank (0-based), then
    * `shard = global_rank div rowsPerShard`, `pos = global_rank mod
    * rowsPerShard` — the (file, offset) a sequential trainer reads. Keying
    * by md5(seed:id) makes the permutation a pure function of (seed, id):
    * stable across runs, engines, partition layouts, and cluster sizes
    * (rand() or monotonically_increasing_id would be none of those).
    *
    * The naive formulation — `row_number() OVER (ORDER BY hash)` — funnels
    * the whole corpus through ONE window partition. This plan never does:
    * the hex key's first byte is a range bucket that agrees with the full
    * key's lexicographic order BY CONSTRUCTION (fixed-width lowercase hex),
    * so the global ranking decomposes into 256 parallel per-bucket windows
    * plus an exclusive-prefix-sum offset join over the 256 bucket counts
    * (broadcast; the offset window orders 256 rows, not the corpus). And
    * where `orderBy(hash)` would pay RangePartitioner's extra sampling job
    * to find split points, md5 uniformity gives fixed equal-width ranges
    * for free. One keyed exchange over the data — the same shape at 100 TB.
    *
    * Output: (idCol, global_rank, shard, pos). Ranks are a bijection onto
    * [0, n) over the NON-NULL ids; null ids are excluded up front (a null
    * id has no md5 key — left in, its bucket would inflate the offsets
    * while the offset equi-join dropped the rows, leaving holes in the
    * rank sequence). Ids must be distinct (md5 collisions aside, the id
    * tie-break makes the order total regardless). */
  def shardedShuffle(df: DataFrame, idCol: String, seed: String,
                     rowsPerShard: Long): DataFrame =
    shuffleImpl(df, idCol, seed, rowsPerShard, priority = None)

  /** CURRICULUM ordering — [[shardedShuffle]] with a priority-major
    * global order: rows sort by (`priorityCol` ASC, md5(seed:id)), so
    * tier 0 (the highest-quality slice) fills the first shards and each
    * tier is internally md5-shuffled — "best data first, shuffled
    * within tier", the quality-curriculum layout pretraining runs use
    * without paying a global sort. Same exact-rank bucket decomposition:
    * the range bucket becomes priority·256 + first-hex-byte (order-
    * consistent with the composite sort key), so no tier ever funnels
    * through one task no matter how skewed the tier sizes are.
    * `priorityCol` must be a non-null integer in [0, 2^23) (the bucket
    * id must stay an exact int) — callers map quality scores to small
    * tier ids first, which is also what keeps the curriculum coarse
    * enough to be meaningful. Output adds the `priority` column. */
  def curriculumShuffle(df: DataFrame, idCol: String, priorityCol: String,
                        seed: String, rowsPerShard: Long): DataFrame =
    shuffleImpl(df, idCol, seed, rowsPerShard, priority = Some(priorityCol))

  private def shuffleImpl(df: DataFrame, idCol: String, seed: String,
                          rowsPerShard: Long,
                          priority: Option[String]): DataFrame = {
    require(rowsPerShard >= 1, s"rowsPerShard must be >= 1, got $rowsPerShard")
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")).cast("binary"))
    // AssertNotNull: provably non-null (md5 of a non-null-filtered id), but
    // the conv/cast chain still PLANS as nullable — and a nullable join key
    // gets the offsets join's IsNotNull pushed into only one subtree,
    // breaking exchange reuse and silently scanning the corpus twice
    // (observed on Spark 4.1.2; pinned in PlanShapeSpec)
    def notNull(c: Column): Column = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))
    val hexByte = conv(substring(key, 1, 2), 16, 10).cast("int")
    // priority-major bucket id: order-consistent with (priority, key)
    // because every priority owns its contiguous 256-bucket block.
    // The tier id must be an INTEGRAL column (a fractional double would
    // truncate two distinct tiers onto one bucket and interleave them
    // silently) in [0, 2^23) (beyond that, *256 overflows int and the
    // "worst" tier would sort before tier 0) — both failure modes are
    // errors, never silent rank corruption
    priority.foreach { p =>
      val t = df.schema(p).dataType
      require(t == org.apache.spark.sql.types.ByteType ||
          t == org.apache.spark.sql.types.ShortType ||
          t == org.apache.spark.sql.types.IntegerType ||
          t == org.apache.spark.sql.types.LongType,
        s"curriculumShuffle: priority column '$p' must be integral, got $t")
    }
    val bucket = notNull(priority match {
      case None => hexByte
      case Some(p) =>
        when(col(p).isNull || col(p) < 0 || col(p) >= (1 << 23),
          raise_error(concat(
            lit(s"curriculumShuffle: priority '$p' outside [0, 2^23): "),
            col(p).cast("string"))).cast("int"))
          .otherwise(col(p).cast("int") * 256 + hexByte)
    })
    val keyed = df.filter(col(idCol).isNotNull)
      .select(Seq(col(idCol), key.as("__k"),
        // first hex byte, exactly consistent with lexicographic key order
        bucket.as("__b")) ++ priority.map(col): _*)
      .repartition(n, col("__b"))
    // Per-bucket rank AND per-bucket count from the SAME exchange: the
    // count is a second window function over the same clustering, and the
    // offsets are derived from the ranked output's bucket representatives
    // (__r == 1), not from a separate groupBy branch — a separate branch
    // gets column-pruned into a DIFFERENT (narrower) exchange subtree that
    // ReuseExchange cannot dedup, silently scanning and hashing the whole
    // upstream pipeline twice (observed in the executed plan). This shape
    // shuffles the corpus exactly once; only the per-bucket sort is
    // evaluated per consumer, over the reused shuffle's local files.
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__k"), col(idCol))
    val ranked = keyed
      .withColumn("__r", row_number().over(wIn))
      .withColumn("__bc", count(lit(1)).over(Window.partitionBy(col("__b"))))
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranked.filter(col("__r") === 1)
      .select(col("__b"), coalesce(sum(col("__bc")).over(wOff), lit(0L)).as("__off"))
    ranked.join(broadcast(offsets), "__b")
      .withColumn("global_rank", (col("__off") + col("__r") - 1).cast("long"))
      // integer div/mod, not float division: ranks are exact longs and must
      // stay exact at any corpus size
      .select(Seq(col(idCol)) ++ priority.map(p => col(p).cast("long").as(p))
        ++ Seq(col("global_rank"),
          expr(s"global_rank div ${rowsPerShard}L").cast("long").as("shard"),
          pmod(col("global_rank"), lit(rowsPerShard)).cast("long").as("pos")): _*)
  }
}
