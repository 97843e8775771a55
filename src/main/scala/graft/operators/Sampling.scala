package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** Deterministic sampling and split assignment for training corpora.
  *
  * Every decision derives from the md5-prefix hash of the row's KEY, so
  * assignments are (a) reproducible across runs, engines and cluster
  * sizes (no RNG, no partition-order dependence — Spark's own
  * `sample()`/`randomSplit()` are partition-order-sensitive and can't be
  * oracle-checked), (b) stable under corpus growth: adding documents
  * never reassigns an existing one, the property that keeps a frozen
  * eval split honest across dataset versions. Pure projections — at
  * 100 TB these run at scan speed, no shuffle.
  */
object Sampling {

  private val Buckets = 10000L

  /** NULL-safe key string with a collision-free sentinel: a non-NULL key
    * hashes as `"v:" + value`, a NULL key (or stratum) as `"null:"` — so a
    * NULL key neither poisons the whole hash to NULL (a NULL-keyed row
    * would silently fail every `bucket < threshold` filter and vanish from
    * samples/strata; in assignSplits it would fall through to the last
    * split) nor shares a bucket stream with a real empty-string key (the
    * `v:` prefix makes the two domains disjoint, so their sampling
    * decisions stay independent). DuckDB-portable form of the full hash
    * input: `coalesce('v:' || CAST(k AS VARCHAR), 'null:')`. */
  private def keyStr(c: Column): Column =
    coalesce(concat(lit("v:"), c.cast("string")), lit("null:"))

  /** Uniform hash bucket in [0, 10000): md5-prefix of the (already
    * sentineled, non-null) key string, engine-portable (DuckDB:
    * `('0x'||substr(md5(k),1,8))::BIGINT % 10000` over the same sentineled
    * input). Callers pass `keyStr(...)`-built strings — `bucket` itself
    * must not re-sentinel or composite keys would double-prefix. */
  private def bucket(key: Column): Column = pmod(hash32(key), lit(Buckets))

  /** Assign every row to a named split by hash bucket: `splits` are
    * (name, weight) with weights summing to 1.0; a row lands in the split
    * whose cumulative-weight interval contains its bucket. Deterministic
    * per key — the canonical train/val/test carve. */
  def assignSplits(df: DataFrame, key: Column, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1.0, got ${splits.map(_._2).sum}")
    val b = bucket(keyStr(key))
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      .map(f => math.round(f * Buckets))
    val expr = splits.zip(bounds).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(b < hi, name))(_.when(b < hi, name)))
    }.get.otherwise(splits.last._1) // rounding guard: bucket 9999 edge
    df.withColumn("split", expr)
  }

  /** Leakage-safe split: assign whole NEAR-DUPLICATE CLUSTERS to one
    * split, so no near-duplicate pair straddles train/test (per-doc
    * hashing leaks — a test doc's near-twin in train inflates eval; the
    * standard contamination path exact dedup can't close). `clusters` is
    * (doc_id, cluster) from any dedup family ([[Dedup.duplicateClusters]]
    * over MinHash/SimHash/embedding pairs); unclustered docs (left-join
    * miss) key by their own doc_id. The split hash runs on the GROUP key,
    * so every member inherits the same assignment by construction, and
    * adding new members to a cluster never moves the cluster.
    *
    * Growth caveat (deliberate): a new doc can BRIDGE two existing
    * clusters; the merged cluster takes one label, so the members keyed
    * by the losing label are reassigned. This is the correct trade —
    * leakage-safety DOMINATES per-doc stability (keeping the two halves
    * in different splits would leave near-twins straddling train/test);
    * [[assignSplits]] on doc_id remains the growth-stable carve for
    * corpora where that property matters more than near-dup hygiene.
    *
    * Scale: one doc_id-keyed left join against the (much smaller)
    * cluster table, then the same scan-speed hash projection as
    * [[assignSplits]] — the cluster table is the output of the already-
    * bucketed dedup pipeline, so nothing here adds a corpus shuffle. */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame,
      splits: Seq[(String, Double)]): DataFrame = {
    val keyed = docs.select(col("doc_id"))
      .join(clusters.select(col("doc_id"), col("cluster")), Seq("doc_id"), "left")
      .withColumn("group_key", coalesce(col("cluster"), col("doc_id")))
    assignSplits(keyed, col("group_key"), splits)
      .select(col("doc_id"), col("group_key"), col("split"))
  }

  /** Deterministic Bernoulli sample at `rate`: keep rows whose seeded
    * bucket falls under rate·10000. The seed participates in the hash so
    * independent samples of the same corpus don't select nested subsets. */
  def sampleByHash(df: DataFrame, key: Column, rate: Double, seed: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(bucket(concat(lit(seed), lit(":"), keyStr(key)))
      < math.round(rate * Buckets))
  }

  /** Per-stratum deterministic sampling: each row's keep decision uses the
    * rate of ITS stratum value (source/language/domain re-weighting — the
    * standard corpus-mixing move). The stratum participates in the hash,
    * so strata sample independently even for equal keys. Unlisted strata
    * fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Seq[(String, Double)], defaultRate: Double = 1.0): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0.0 && r <= 1.0),
      "all rates must be in [0,1]")
    // thresholds are DRIVER-computed literals (math.round, like
    // sampleByHash/assignSplits) — an engine-side round(rate·10⁴) column
    // would put Spark's HALF_UP-on-decimal-repr vs DuckDB's binary round
    // into the gate on .5-boundary products, the repo's pinned
    // quantization divergence class
    val thr = rates.foldLeft(Option.empty[Column]) {
      case (acc, (s, r)) =>
        val t = lit(math.round(r * Buckets))
        Some(acc.fold(when(stratum === s, t))(_.when(stratum === s, t)))
    }.fold(lit(math.round(defaultRate * Buckets)))(
      _.otherwise(math.round(defaultRate * Buckets)))
    // NULL stratum already falls to defaultRate via the when-chain; the
    // hash must stay NULL-safe too or the row is dropped regardless of rate
    // (DuckDB: md5('v:' || stratum || ':v:' || CAST(k AS VARCHAR)))
    val b = bucket(concat(keyStr(stratum), lit(":"), keyStr(key)))
    df.filter(b < thr)
  }

  /** Deterministic sequence packing for training: documents are bucketed
    * into `shards` by doc_id hash, laid out in doc_id order within each
    * shard as one contiguous token stream, and assigned to the pack where
    * their FIRST token lands (pack i covers stream offsets
    * [i·budget, (i+1)·budget)). This is contiguous offset-chunking, not
    * bin packing: a pack can overflow by at most one straddling document —
    * the standard concat-then-cut layout training loaders use, where the
    * loader's final cut (not the distributed layout) enforces exact
    * sequence lengths.
    *
    * Scale: the only wide op is the per-shard running token sum — a window
    * PARTITIONED BY shard (parallelism = `shards`; size it to ~cores at
    * the target scale). Deterministic like the rest of this file: hash
    * sharding + doc_id order, no RNG, no partition-order dependence.
    * Under APPEND-ONLY ingestion (every new doc_id above all existing
    * ones, the normal monotonic-id regime) growth only extends each
    * shard's stream, so earlier packs are byte-stable; a backfilled doc
    * with an out-of-order id inserts mid-stream and reassigns the packs
    * behind it in that shard — re-cut downstream packs after backfills. */
  def packSequences(docs: DataFrame, budget: Long, shards: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val n = size(graft.functions.TextFunctions.tokensFused(col("text"))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col("doc_id"), n.as("n_tokens"),
        pmod(hash32(col("doc_id").cast("string")), lit(shards.toLong)).as("shard"))
      // start offset = running sum minus own length; floor over DOUBLE is
      // IEEE-exact for token counts < 2^52 and matches DuckDB bit-for-bit
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")).cast("double") / budget)
          .cast("long"))
      .select(col("doc_id"), col("shard"), col("pack_id"), col("n_tokens"))
  }

  /** Keep at most `maxRows` rows per stratum, selected DETERMINISTICALLY
    * by full-32-bit-hash order (key ascending breaks only true hash
    * collisions) — the per-source / per-domain quota every corpus-mixing
    * recipe applies so one crawl domain cannot dominate the mix. Hash
    * order (not doc order) makes the kept subset an unbiased sample of
    * the stratum, and the same rows win on every engine and run. The full
    * hash (not the mod-10000 bucket) matters for strata larger than
    * ~10000·maxRows: a coarser order would select the boundary bucket's
    * winners by raw key ascending — a doc-id-order bias. shuffleRank uses
    * the same full-width order for the same reason.
    *
    * Scale: one shuffle keyed by stratum; the rank<=k filter plans as
    * WindowGroupLimit, so each map task pre-prunes to its local top-k
    * before the exchange — a skewed mega-stratum ships k rows per task,
    * not its whole population. */
  def capPerStratum(df: DataFrame, key: Column, stratum: Column, maxRows: Int): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hash32(keyStr(key)).asc, key.asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxRows).drop("__rk")
  }

  /** Deterministic held-out carve: per stratum, the `nEval` hash-smallest
    * keys label `eval`, everything else `train` — the "guarantee every
    * language/source a minimum eval slice" construction a proportional
    * split cannot give (a 0.1% stratum would contribute ~0 eval docs).
    * Growth-stable like assignSplits: a doc's label never changes as the
    * corpus grows UNLESS it sits at a stratum's hash-order boundary when
    * new docs hash below it — the same boundary rule capPerStratum's
    * kept set follows. NULL keys label `train` by contract (they cannot
    * be addressed individually) and never consume eval quota.
    *
    * Keys need not be unique: the quota is counted over DISTINCT
    * (key, stratum) pairs — the carve picks the nEval hash-smallest KEYS
    * per stratum, and every row carrying an eval key labels `eval`
    * (duplicates of one key consume ONE quota slot, not several; a
    * row-capped rank would quietly under-fill the guaranteed slice).
    *
    * Scale: the carve reuses capPerStratum's skew-proof plan
    * (WindowGroupLimit below the stratum exchange — a mega-stratum ships
    * nEval rows per map task, not its population); the label-back join's
    * build side is #strata × nEval keys — broadcastable. */
  def evalCarve(df: DataFrame, key: Column, stratum: Column, nEval: Int): DataFrame = {
    require(nEval > 0, s"nEval must be positive, got $nEval")
    // distinct BEFORE the cap: the quota is nEval KEYS per stratum, so
    // duplicate rows of one key must not consume extra slots
    val distinctKeys = df.filter(key.isNotNull)
      .select(key.as("__k"), stratum.as("__st")).distinct()
    val evalKeys = capPerStratum(distinctKeys, col("__k"), col("__st"), nEval)
      .select(col("__k").as("__eval_k")).distinct()
    df.join(broadcast(evalKeys), key === col("__eval_k"), "left_outer")
      .withColumn("split",
        when(col("__eval_k").isNotNull, lit("eval")).otherwise(lit("train")))
      .drop("__eval_k")
  }

  /** Temperature-flattened per-stratum quotas — the multi-source /
    * multilingual mixing rule (XLM-R-style exponentiated sampling):
    * stratum s keeps `floor(scale · n_s^alpha + 0.5)` rows, so alpha < 1
    * FLATTENS dominant strata (a 3× bigger source keeps only 3^alpha×
    * more rows) while alpha = 1 reduces to proportional pass-through.
    * Selection within a stratum is the deterministic full-hash order
    * (capPerStratum's rule): the kept subset is an unbiased, engine-
    * stable sample and a stratum's kept set only shrinks/grows at the
    * hash-order boundary as its target moves.
    *
    * Cross-engine exactness: alpha = 0.5 computes the target via sqrt —
    * an IEEE correctly-rounded operation, bit-identical in any engine —
    * which is what the oracle entry pins. Other alphas go through pow,
    * which libm does NOT guarantee correctly rounded; reproducibility
    * then holds per-engine, not across engines (documented tradeoff).
    *
    * Scale: one shuffle keyed by stratum; the per-stratum count and rank
    * share that single exchange. Unlike capPerStratum the rank bound is
    * data-dependent, so there is no map-side WindowGroupLimit prune — a
    * skewed mega-stratum ships its population; if targets are known
    * ahead of time, precompute counts and use capPerStratum per stratum
    * for the skew-proof plan. */
  def temperatureQuota(df: DataFrame, key: Column, stratum: Column,
      alpha: Double = 0.5, scale: Double = 1.0): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(scale > 0.0, s"scale must be positive, got $scale")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hash32(keyStr(key)).asc, key.asc)
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
    val n = count(lit(1)).over(wc).cast("double")
    val scaled =
      if (alpha == 0.5) lit(scale) * sqrt(n)
      else if (alpha == 1.0) lit(scale) * n
      else lit(scale) * pow(n, lit(alpha))
    // floor(x + 0.5), never round(): HALF_UP vs binary-round ties (the
    // repo-wide quantization invariant)
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__tgt", floor(scaled + lit(0.5)).cast("long"))
      .filter(col("__rk") <= col("__tgt"))
      .drop("__rk", "__tgt")
  }

  /** Per-stratum TOKEN-budget quotas — the data-mixing rule when recipes
    * are written in tokens, not rows ("20B tokens of web, 5B of code"):
    * each stratum keeps docs in the deterministic full-hash order
    * (capPerStratum's rule — unbiased, engine-stable, growth-stable at
    * the boundary) while the cumulative token count BEFORE the doc is
    * still under the stratum's budget. The straddling doc is KEPT, so a
    * stratum with enough material always fills its budget (training
    * wants the budget met; the loader's final cut trims the overshoot —
    * the packSequences convention). Budgets are per-stratum with a
    * default, like stratifiedSample's rates.
    *
    * Scale: one stratum-keyed shuffle carrying (row, n_tokens); the
    * running sum rides the same exchange. Like temperatureQuota the stop
    * bound is data-dependent, so there is no map-side WindowGroupLimit
    * prune — a skewed mega-stratum ships its population; convert budgets
    * to row caps via mean doc length and pre-prune with capPerStratum if
    * that matters. Token counting is the pinned tokenizer, map-side. */
  def tokenBudgetQuota(docs: DataFrame, key: Column, stratum: Column,
      budgets: Seq[(String, Long)], defaultBudget: Long): DataFrame = {
    require(defaultBudget >= 0 && budgets.forall(_._2 >= 0),
      "budgets must be non-negative")
    val budget = budgets.foldLeft(Option.empty[Column]) {
      case (acc, (s, b)) =>
        Some(acc.fold(when(stratum === s, b))(_.when(stratum === s, b)))
    }.fold(lit(defaultBudget))(_.otherwise(defaultBudget))
    val n = size(graft.functions.TextFunctions.tokensFused(col("text")))
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hash32(keyStr(key)).asc, key.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.withColumn("__n", n)
      .withColumn("__cb", sum(col("__n")).over(w) - col("__n"))
      .filter(col("__cb") < budget)
      .drop("__n", "__cb")
  }

  /** Integer per-stratum upsampling — the other half of mixture recipes:
    * a rare-but-valuable stratum is OVERSAMPLED by repeating each of its
    * rows `factor` times (multi-epoch exposure of the small source while
    * the big sources pass once). Copies carry an `epoch` column
    * (0..factor-1) so downstream layout (shuffleRank keyed on
    * (doc_id, epoch), packing) treats them as distinct rows and a given
    * doc's copies spread through the training order instead of running
    * back-to-back. Factor 0 drops the stratum (a blocklist in the same
    * breath); unlisted strata use `defaultFactor`.
    *
    * Scale: a map-side bounded explode — no shuffle, no state; the
    * epoch column is the determinism (no RNG replication). Fractional
    * oversampling composes from this plus a stratifiedSample of one
    * extra epoch (e.g. 2.3x = factor 2 + a 0.3-rate sample as epoch 2). */
  def upsampleByFactor(df: DataFrame, stratum: Column,
      factors: Seq[(String, Int)], defaultFactor: Int = 1): DataFrame = {
    require(defaultFactor >= 0 && factors.forall(_._2 >= 0),
      "factors must be non-negative")
    val factor = factors.foldLeft(Option.empty[Column]) {
      case (acc, (s, f)) =>
        Some(acc.fold(when(stratum === s, f))(_.when(stratum === s, f)))
    }.fold(lit(defaultFactor))(_.otherwise(defaultFactor))
    // sequence(0, -1) infers a DESCENDING step ([0,-1]) — the repo-wide
    // guard: factor 0 must produce an EMPTY array, not two epochs
    df.withColumn("epoch",
      explode(when(factor > 0, sequence(lit(0), factor - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Fixed-budget deterministic corpus sample: the `n` rows with the
    * smallest (full 32-bit hash, key) — an unbiased engine-stable sample
    * of exactly min(n, |corpus|) rows (the eval-set / debug-slice carve
    * with a row budget instead of a rate). Plans as
    * TakeOrderedAndProject: per-partition top-n heaps + an n-row driver
    * merge — never a global sort, scale-safe for any corpus size with
    * driver memory O(n). */
  def sampleFixed(df: DataFrame, key: Column, n: Int, seed: String = ""): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    df.withColumn("__h", hash32(concat(lit(seed), lit(":"), keyStr(key))))
      .orderBy(col("__h").asc, key.asc)
      .limit(n)
      .drop("__h")
  }

  /** Deterministic global shuffle order for training: every row gets a
    * dense 0-based `shuffle_pos` equal to its rank under (md5-bucket hash,
    * key) — a reproducible pseudo-random permutation of the corpus (the
    * training-order shuffle, but engine-stable and resumable, unlike an
    * RNG shuffle).
    *
    * Scale: a naive `row_number() OVER (ORDER BY hash)` is a GLOBAL
    * window — the whole corpus funnels through one task. This is the same
    * two-pass distributed prefix rank as packSequencesScalable, over
    * DETERMINISTIC hash-range buckets: the md5 hash is uniform in
    * [0, 2^32), so `bucket = __h div ceil(2^32/partitions)` is a balanced,
    * order-preserving split that is a PURE FUNCTION of the row — both
    * passes recompute identical boundaries from the data alone, with no
    * materialized layout to freeze (the earlier form needed
    * `repartitionByRange` + localCheckpoint, whose unreplicated
    * executor-local blocks made an executor loss unrecoverable mid-job
    * and whose corpus-sized copy competed with shuffle for memory).
    * Pass 1 collects per-bucket COUNTS (<= `partitions` rows,
    * driver-tiny); pass 2 broadcasts exclusive prefix offsets back and
    * completes the rank per bucket — parallelism = `partitions`, output
    * identical to the global sort. The input is persisted (lineage-backed
    * — an executor loss recomputes, unlike a localCheckpoint) so the two
    * passes share one upstream scan; released via Dedup.releaseCaches. */
  def shuffleRank(df: DataFrame, key: Column, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val width = ((1L << 32) + parts - 1) / parts // ceil(2^32 / parts)
    val arranged = Dedup.track(df
      .withColumn("__h", hash32(keyStr(key)))
      .withColumn("__b", expr(s"__h div $width"))
      .persist())
    val counts = arranged.groupBy(col("__b")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2))
    import spark.implicits._
    val offFrame = offsets.toSeq.toDF("__b", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h").asc, key.asc)
    arranged.join(broadcast(offFrame), "__b")
      .withColumn("shuffle_pos", col("__off") + row_number().over(w) - 1)
      .drop("__h", "__b", "__off")
  }

  /** packSequences with a DISTRIBUTED prefix sum — identical assignments
    * (SamplingSpec asserts row-for-row equality with the window form), but
    * parallelism is no longer capped at `shards`: the single-window form
    * funnels a shard's whole token stream through one task, which is fine
    * at shards ≈ cores but serializes a 100 TB corpus a user packs into
    * few shards.
    *
    * Two passes over DETERMINISTIC doc_id-range sub-buckets (the classic
    * scan-then-offset prefix-sum):
    *  1. one cheap min/max(doc_id) agg fixes fixed-width id ranges
    *     `__sub = (doc_id - lo) div chunk` — an order-preserving split
    *     within each shard that is a PURE FUNCTION of the row (the
    *     earlier form froze a sampled `repartitionByRange` layout with
    *     localCheckpoint, whose unreplicated executor-local blocks made
    *     an executor loss unrecoverable mid-job); then collect
    *     per-(shard, sub) token sums — <= shards·(partitions+1) rows,
    *     driver-tiny;
    *  2. per-shard cumulative offsets of earlier sub-buckets
    *     broadcast-join back, and the running sum completes WITHIN each
    *     (shard, sub) slice — window groups number up to
    *     shards·partitions, so every core works regardless of `shards`.
    *
    * offset(shard, sub) + slice-running-sum = the shard's global running
    * sum (longs, associative), so pack ids are bit-identical to the
    * single-window form. Balance note: fixed-width id ranges are balanced
    * for the normal dense monotonically-assigned doc_id regime; a
    * pathologically clustered sparse id space degrades parallelism (some
    * empty sub-buckets), never correctness. The tokenized input is
    * persisted (lineage-backed — recomputable after executor loss, unlike
    * a localCheckpoint) so the two passes tokenize once; released via
    * Dedup.releaseCaches. */
  def packSequencesScalable(docs: DataFrame, budget: Long, shards: Int = 64,
      partitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = docs.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val n = size(graft.functions.TextFunctions.tokensFused(col("text"))).cast("long")
    // deterministic range boundaries from one driver-tiny agg (doc_id
    // projection only — Catalyst prunes the text column away)
    val mm = docs.agg(min(col("doc_id").cast("long")).as("lo"),
      max(col("doc_id").cast("long")).as("hi")).first()
    val lo = if (mm.isNullAt(0)) 0L else mm.getLong(0)
    val hi = if (mm.isNullAt(1)) 0L else mm.getLong(1)
    val chunk = math.max(1L, (hi - lo) / parts + 1L)
    // __sk: null-safe surrogate for the shard key. A NULL doc_id hashes to
    // a NULL shard; the window form groups those rows in their own NULL
    // partition, but a grouping/join key of NULL would (a) NPE the driver
    // collect and (b) silently DROP the rows at the offsets equi-join
    // (null-unsafe). -1 is outside pmod's [0, shards) range and below
    // every real sub-bucket, so it cannot collide.
    val arranged = Dedup.track(docs
      .select(col("doc_id"), n.as("n_tokens"),
        pmod(hash32(col("doc_id").cast("string")), lit(shards.toLong)).as("shard"))
      .withColumn("__sk", coalesce(col("shard"), lit(-1L)))
      .withColumn("__sub",
        when(col("doc_id").isNull, lit(-1L))
          .otherwise(expr(s"(CAST(doc_id AS BIGINT) - ${lo}L) div ${chunk}L")))
      .persist())
    val sums = arranged.groupBy(col("__sub"), col("__sk"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // per shard: sub-ascending exclusive prefix sums (offset of each slice)
    val offsets = sums.groupBy(_._2).toSeq.flatMap { case (sk, slices) =>
      val bySub = slices.sortBy(_._1)
      bySub.map(_._1).zip(bySub.scanLeft(0L)(_ + _._3))
        .map { case (sub, off) => (sub, sk, off) }
    }
    import spark.implicits._
    val offFrame = offsets.toSeq.toDF("__sub", "__sk", "off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__sub"), col("__sk")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    arranged
      .join(broadcast(offFrame), Seq("__sub", "__sk"))
      .withColumn("pack_id",
        floor((col("off") + sum(col("n_tokens")).over(w) - col("n_tokens")).cast("double")
          / budget).cast("long"))
      .select(col("doc_id"), col("shard"), col("pack_id"), col("n_tokens"))
  }

  /** Exact type-1 (lower) quantile thresholds over a BOUNDED integer
    * column, WITHOUT a global sort: one histogram aggregation (output
    * cardinality = the value DOMAIN size, data-size-free — the reason
    * this works where a double column wouldn't), a cumulative count over
    * that histogram, and one row of thresholds out. `fractions` are
    * (num, den) rationals so every rank comparison stays integer-exact:
    * threshold_i = min v with cum(v)·den_i ≥ N·num_i, i.e. the smallest
    * value whose cumulative count reaches ⌈N·p⌉ — no interpolation, no
    * float rank. NULL values are excluded from N (no position in the
    * order).
    *
    * Scale: the corpus is touched ONCE by the partial-agged histogram
    * groupBy; the single-partition running sum runs over the histogram —
    * bounded by the domain (e.g. ≤ 10^6+1 rows for micro-quantized
    * scores), never by the corpus, which is what makes the global
    * cumulative admissible where a corpus-wide one would be the
    * classic single-task scale-killer (see shuffleRank for the
    * corpus-sized alternative). Returns 1 row: (n, t0..t{m-1}). */
  def boundedIntQuantiles(df: DataFrame, value: Column,
      fractions: Seq[(Int, Int)]): DataFrame = {
    require(fractions.nonEmpty, "need at least one fraction")
    fractions.foreach { case (num, den) =>
      require(num >= 0 && den > 0 && num <= den, s"fraction $num/$den not in [0,1]") }
    val hist = df.select(value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    // single-partition running sum via mapPartitions, NOT a partition-less
    // window: same plan cost (the global window needed the same 1-partition
    // exchange over the domain-bounded histogram) minus the
    // `WindowExec: No Partition Defined` warning that would bury a REAL
    // corpus-sized global window in the logs
    val spark = df.sparkSession
    import spark.implicits._
    val cum = hist.coalesce(1).sortWithinPartitions(col("__v"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        var acc = 0L
        it.map { case (v, c) => acc += c; (v, c, acc) }
      }
      .toDF("__v", "__c", "__cum")
      .crossJoin(broadcast(hist.agg(coalesce(sum(col("__c")), lit(0L)).as("__n"))))
    // cum ≥ ⌈n·num/den⌉  ⇔  cum·den ≥ n·num  (cum integer)
    val thresholds = fractions.zipWithIndex.map { case ((num, den), i) =>
      min(when(col("__cum") * den >= col("__n") * num, col("__v"))).as(s"t$i")
    }
    cum.agg(max(col("__n")).as("n"), thresholds: _*)
  }
}
