package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force is the exact baseline: broadcast the (small) query set and
  * scan the corpus once — O(N·Q) work, embarrassingly parallel, no shuffle
  * until the per-query top-k (tiny after the rank filter). The scale path
  * for huge corpora is LSH bucketing (`hyperplaneBuckets`): sign-bit
  * sketches from fixed hyperplanes so only same-bucket vectors are compared.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    *
    * Similarities are rounded to 6 decimals and ranked on (rounded sim
    * desc, vec_id) so results are reproducible across engines.
    */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val v = vectors.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val q = queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qe"))
    val ranked = v.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(graft.plans.VectorExpressions.cosineFused(col("qe"), col("e")), 6).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rk") <= k)
    ranked.select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }

  /** Contrastive-pair mining for embedding-model training data: per query
    * vector, the `kPos` most-similar SAME-label vectors (the positives a
    * contrastive loss pulls together) and the `kNeg` most-similar
    * DIFFERENT-label vectors (the HARD negatives it pushes apart — random
    * negatives are trivially far and teach nothing; the near-miss ones
    * carry the gradient signal). One row per mined pair:
    * (qid, vec_id, label, role ∈ pos|neg, sim, rk), rk dense within
    * (qid, role). Self-pairs excluded; rounding/tie rules are
    * bruteForceTopK's (6-decimal sim, vec_id tiebreak) so the mined set
    * is reproducible across engines and runs.
    *
    * Scale: the query side is a training batch — broadcast it; the
    * corpus is scanned ONCE map-side (fused cosine, no shuffle before
    * the per-(query, role) top-k rank, which WindowGroupLimit pre-prunes
    * map-side). Corpus-scale query sets should go through the IVF/LSH
    * bucketed paths per label stratum instead (the t_ann_* scale
    * answers). */
  def contrastiveMine(vectors: DataFrame, queries: DataFrame,
      kPos: Int = 3, kNeg: Int = 5): DataFrame = {
    require(kPos > 0 && kNeg > 0, s"kPos/kNeg must be positive, got $kPos/$kNeg")
    val v = vectors.select(col("vec_id"), col("label"), toDouble(col("embedding")).as("e"))
    val q = queries.select(col("vec_id").as("qid"), col("label").as("qlabel"),
      toDouble(col("embedding")).as("qe"))
    v.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), col("label"),
        when(col("label") === col("qlabel"), lit("pos")).otherwise(lit("neg")).as("role"),
        round(graft.plans.VectorExpressions.cosineFused(col("qe"), col("e")), 6).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"), col("role"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rk") <= when(col("role") === "pos", kPos).otherwise(kNeg))
  }

  /** Embedding-cosine near-duplicate pairs: all (a,b), a<b, with cosine >=
    * threshold. Exact O(N²) form with the fused cosine expression — the
    * bucketed variant (lshTopK's join topology) is the huge-N path. */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val v = vectors.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val a = v.select(col("vec_id").as("vec_a"), col("e").as("ea"))
    val b = v.select(col("vec_id").as("vec_b"), col("e").as("eb"))
    a.crossJoin(broadcast(b))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", graft.plans.VectorExpressions.cosineFused(col("ea"), col("eb")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim"))
  }

  /** LSH bucket id from `nPlanes` fixed pseudo-random hyperplanes.
    *
    * Plane p's component j is derived deterministically from md5(p:j)
    * (uniform in [-0.5, 0.5)), so the sketch is reproducible without a
    * fitted model. Vectors in the same bucket are near in angle with high
    * probability; ANN = exact search within bucket. The sketch is ONE fused
    * native expression (plans.HyperplaneSketch) — the legacy composed form
    * below is kept only as the identity oracle for PlansSpec.
    */
  def hyperplaneBuckets(vectors: DataFrame, dim: Int, nPlanes: Int = 8): DataFrame =
    vectors.select(col("vec_id"), col("embedding"),
      graft.plans.VectorExpressions
        .hyperplaneSketch(toDouble(col("embedding")), dim, nPlanes).as("bucket"))

  /** The pre-fusion dim×nPlanes expression-tree form of `hyperplaneBuckets`
    * — bit-identical by construction (same md5-derived plane components,
    * same ascending-j accumulation); PlansSpec asserts the equality. Not a
    * production path: at production dims (512–1536) this tree is a
    * constant-folding/codegen blowup. */
  def hyperplaneBucketsComposed(vectors: DataFrame, dim: Int, nPlanes: Int = 8): DataFrame = {
    val e = toDouble(col("embedding"))
    val bucket = (0 until nPlanes).map { p =>
      // plane ⋅ v > 0 ? bit p set : 0
      val dotP = (0 until dim).map { j =>
        val u = conv(substring(md5(lit(s"$p:$j")), 1, 8), 16, 10).cast("double") / lit(4294967296.0) - 0.5
        element_at(e, j + 1) * u
      }.reduce(_ + _)
      when(dotP > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    vectors.select(col("vec_id"), col("embedding"), bucket.as("bucket"))
  }

  /** Scale path for `cosineNearDupPairs`: banded hyperplane-LSH candidate
    * generation + exact re-scoring — same output contract (all (a,b), a<b,
    * cosine >= threshold), proven pair-identical to the exact O(N²) form
    * against the same DuckDB oracle (t_dedup_embedding_bucketed).
    *
    * Topology: one fused sketch of nBands·rowsPerBand sign bits per vector,
    * exploded to (band, band_bits) keys; the self-join shuffles on those
    * keys (the only shuffle — no whole-corpus broadcast, no O(N²) task),
    * candidates are distinct-ed and exact-scored. A pair at cosine s agrees
    * on one band with prob (1 - acos(s)/π)^rowsPerBand; missing ALL bands at
    * the defaults (r=2, b=24, s=0.45) is ~2e-6 per pair — and recall only
    * rises with s. At production thresholds (>= 0.8) raise rowsPerBand to
    * 4-8: buckets sharpen and the candidate set collapses toward the true
    * pair set, which is what makes this the 100 TB path.
    */
  def cosineNearDupPairsBucketed(
      vectors: DataFrame,
      threshold: Double,
      dim: Int,
      rowsPerBand: Int = 2,
      nBands: Int = 24,
      probeHamming1: Boolean = false): DataFrame = {
    // all bands' sign bits pack into ONE long sketch; past 64 the shift
    // wraps (mod-64) and bands silently alias onto each other's bits
    require(rowsPerBand * nBands <= 64,
      s"rowsPerBand*nBands must be <= 64 sketch bits, got ${rowsPerBand * nBands}")
    val v = vectors.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("sk", graft.plans.VectorExpressions
        .hyperplaneSketch(col("e"), dim, rowsPerBand * nBands))
    val mask = (1L << rowsPerBand) - 1
    val banded = v.select(col("vec_id"), col("e"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("sk"), b * rowsPerBand).bitwiseAND(lit(mask)).as("bk"))): _*)).as("band"))
      .select(col("vec_id"), col("e"), col("band.b").as("b"), col("band.bk").as("bk"))
    // Hamming-1 band probing (multi-probe LSH, Lv et al. VLDB'07, applied
    // to the self-join): sharp bands (rowsPerBand 4+) shrink candidate
    // sets but push the all-bands-miss probability for boundary pairs
    // into the percent range (measured: 2/89 pairs missed at sf0.1,
    // r=4 b=16 s=0.46). Probing each band's key plus its rowsPerBand
    // one-bit flips on ONE side of the join recovers any pair within
    // Hamming distance 1 of agreeing — miss drops to ~1e-6 — at a
    // (1+rowsPerBand)× fan-out of the probe side only. The a<b ordering
    // means probing only x still covers every pair.
    val probeSide =
      if (!probeHamming1) banded
      else banded.withColumn("pm",
          explode(array((lit(0L) +: (0 until rowsPerBand).map(i => lit(1L << i))): _*)))
        .withColumn("bk", col("bk").bitwiseXOR(col("pm"))).drop("pm")
    val cand = probeSide.as("x")
      .join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val a = vectors.select(col("vec_id").as("vec_a"), toDouble(col("embedding")).as("ea"))
    val b = vectors.select(col("vec_id").as("vec_b"), toDouble(col("embedding")).as("eb"))
    cand.join(a, "vec_a").join(b, "vec_b")
      .withColumn("sim", graft.plans.VectorExpressions.cosineFused(col("ea"), col("eb")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al., 2023: cluster the
    * embedding space, then search for near-duplicates WITHIN clusters
    * only): assign every vector to its nearest centroid with the fused
    * map-side argmax (zero exchanges — the k-means assign shape), then
    * emit all same-cluster pairs (a<b) with cosine >= threshold.
    *
    * Clustering is the third bucketing family next to hyperplane-LSH
    * (angle buckets) and MinHash bands (token buckets): data-adaptive
    * buckets from a trained codebook. The centroid set is a driver-tiny
    * (k×dim) parameter — train it with Ivf.train in production; the
    * catalog entry pins a deterministic seed set so the DuckDB oracle can
    * recompute the assignment bit-for-bit.
    *
    * Scale: one scan assigns (map-side), ONE shuffle on cid co-locates
    * each cluster, and the pairwise stage is Σ n_c² instead of N² — the
    * paper's point. A skewed mega-cluster is the hot-bucket case: raise k
    * or sub-split with a second centroid tier (same shape, per cluster). */
  def semanticDedupPairs(vectors: DataFrame, cids: Seq[Long],
      cents: Seq[Seq[Double]], threshold: Double): DataFrame = {
    val v = vectors
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("asg", graft.plans.VectorExpressions
        .nearestCentroid(col("e"), cids, cents))
      .select(col("vec_id"), col("e"), col("asg.cid").as("cid"))
    val a = v.select(col("cid"), col("vec_id").as("vec_a"), col("e").as("ea"))
    val b = v.select(col("cid").as("cid_b"), col("vec_id").as("vec_b"), col("e").as("eb"))
    a.join(b, col("cid") === col("cid_b") && col("vec_a") < col("vec_b"))
      .withColumn("sim", graft.plans.VectorExpressions.cosineFused(col("ea"), col("eb")))
      .filter(col("sim") >= threshold)
      .select(col("cid"), col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim"))
  }

  /** Cluster-balanced selection (the DataComp pruning posture): assign
    * every vector to its nearest seed centroid with the fused map-side
    * argmax, then keep the top `keepPerCluster` rows per cluster by
    * (score DESC, vec_id ASC). A GLOBAL top-quality cut collapses the
    * kept set onto the densest high-score region of embedding space; the
    * per-cluster quota preserves coverage while still preferring quality
    * within each region — quality selection that cannot destroy
    * diversity. `score` is any per-row Column (a classifier score, an LM
    * fluency, a label tier); vectors with a NULL embedding get a NULL
    * cid and compete in their own quota group (the Ivf.assign NULL
    * contract, documented there).
    *
    * Scale: the assign stage is one exchange-free codegen'd projection
    * (the Ivf/NearestCentroid shape); the quota is a cid-keyed shuffle
    * whose rank <= k plans as WindowGroupLimit with a CONSTANT k — each
    * map task pre-prunes to its local top-k before the exchange
    * (capPerStratum's skew-proof rule), so a mega-cluster ships k rows
    * per task, not its population. Centroids come from Ivf.train in
    * production; the catalog entry pins deterministic seeds. */
  def semanticPrune(vectors: DataFrame, score: Column, cids: Seq[Long],
      cents: Seq[Seq[Double]], keepPerCluster: Int): DataFrame = {
    require(keepPerCluster > 0, s"keepPerCluster must be positive, got $keepPerCluster")
    val v = vectors.withColumn("cid",
      graft.plans.VectorExpressions
        .nearestCentroid(toDouble(col("embedding")), cids, cents).getField("cid"))
    val w = Window.partitionBy(col("cid")).orderBy(score.desc, col("vec_id").asc)
    v.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= keepPerCluster)
      .drop("__rk")
  }

  /** Semantic decontamination: label every corpus vector that is cosine->=
    * threshold near ANY benchmark vector — the embedding-space member of
    * the decontamination family (next to the n-gram join, the Bloom scan,
    * and span removal in TextAnalysis), for the leaks a text match cannot
    * see: paraphrased or re-worded benchmark items that embed nearby.
    *
    * Topology is the bipartite form of cosineNearDupPairsBucketed: both
    * sides sketch map-side with the SAME fixed hyperplanes, the join key is
    * (band, band_bits), and only candidates are exact-scored. Hamming-1
    * multi-probing fans out the BENCHMARK side only (the tiny one), so the
    * corpus is never replicated — the lshProbedTopK rule. The corpus's
    * only shuffles are the band join and the final EXISTS distinct; the
    * benchmark band table is small enough to auto-broadcast, making the
    * whole check effectively one corpus scan at 100 TB.
    *
    * Contract: (vec_id, contaminated) for EVERY corpus vector. Recall at
    * the banding operating point is the measured pair-identity of the
    * t_dedup_embedding_bucketed_hi entry (~1e-6 analytic miss with
    * probing); the DuckDB oracle runs the exact bipartite all-pairs check,
    * so the catalog hash-match proves the banding is invisible on real
    * data, not assumed. */
  def decontaminateEmbeddings(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double, dim: Int, rowsPerBand: Int = 4, nBands: Int = 16,
      probeHamming1: Boolean = true): DataFrame = {
    require(rowsPerBand * nBands <= 64,
      s"rowsPerBand*nBands must be <= 64 sketch bits, got ${rowsPerBand * nBands}")
    val mask = (1L << rowsPerBand) - 1
    def banded(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
          graft.plans.VectorExpressions
            .hyperplaneSketch(toDouble(col("embedding")), dim, rowsPerBand * nBands)
            .as("sk"))
        .select(col(idAs),
          explode(array((0 until nBands).map(b =>
            struct(lit(b).as("b"),
              shiftright(col("sk"), b * rowsPerBand).bitwiseAND(lit(mask)).as("bk"))): _*))
            .as("band"))
        .select(col(idAs), col("band.b").as("b"), col("band.bk").as("bk"))
    // candidate ids first, embeddings joined back after the distinct — the
    // band shuffle ships (id, b, bk) only, never nBands copies of the
    // vector (cosineNearDupPairsBucketed's column-pruning discipline,
    // made explicit here because the verify inputs differ per side)
    val c = banded(corpus, "vec_id")
    val bench0 = banded(benchmark, "bid")
    val bench =
      if (!probeHamming1) bench0
      else bench0.withColumn("pm",
          explode(array((lit(0L) +: (0 until rowsPerBand).map(i => lit(1L << i))): _*)))
        .withColumn("bk", col("bk").bitwiseXOR(col("pm"))).drop("pm")
    val cand = c.join(bench, Seq("b", "bk"))
      .select(col("vec_id"), col("bid")).distinct()
    val ce = corpus.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val be = benchmark.select(col("vec_id").as("bid"), toDouble(col("embedding")).as("be"))
    val hits = cand.join(ce, "vec_id").join(be, "bid")
      .filter(graft.plans.VectorExpressions.cosineFused(col("e"), col("be")) >= threshold)
      .select(col("vec_id")).distinct()
    corpus.select(col("vec_id"))
      .join(hits.withColumn("__hit", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("__hit").isNotNull.as("contaminated"))
  }

  /** ANN top-k within LSH buckets: same contract as bruteForceTopK but only
    * same-bucket pairs are scored — the candidate join shuffles on bucket id
    * instead of materializing the full N×Q cross product. */
  def lshTopK(vectors: DataFrame, queries: DataFrame, dim: Int, k: Int, nPlanes: Int = 8): DataFrame =
    lshProbedTopK(vectors, queries, dim, k, nPlanes, probeMasks = Seq(0L))

  /** Multi-probe LSH top-k (Lv et al., VLDB'07): each query probes its own
    * bucket PLUS the `nPlanes` buckets at Hamming distance 1 (one sign bit
    * flipped — the buckets a borderline vector most likely fell into).
    * Candidates stay disjoint (a vector lives in exactly one bucket), so
    * recall rises with zero dedup cost; the probe fan-out multiplies only
    * the broadcast QUERY side, never the corpus. Same output contract as
    * lshTopK. */
  def lshTopKMultiProbe(vectors: DataFrame, queries: DataFrame, dim: Int,
      k: Int, nPlanes: Int = 8): DataFrame =
    lshProbedTopK(vectors, queries, dim, k, nPlanes,
      probeMasks = 0L +: (0 until nPlanes).map(p => 1L << p))

  /** Shared LSH probe topology: corpus bucketed once; each query explodes
    * to bucket XOR mask per probe mask, joins on bucket, exact-scores and
    * ranks. lshTopK = mask {0}; multi-probe adds the Hamming-1 masks —
    * ONE body so the score/rank/tie-break contract cannot diverge. */
  private def lshProbedTopK(vectors: DataFrame, queries: DataFrame, dim: Int,
      k: Int, nPlanes: Int, probeMasks: Seq[Long]): DataFrame = {
    val v = hyperplaneBuckets(vectors, dim, nPlanes)
      .select(col("vec_id"), toDouble(col("embedding")).as("e"), col("bucket"))
    val probeSet = array(probeMasks.map(lit): _*)
    val q = hyperplaneBuckets(queries, dim, nPlanes)
      .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qe"),
        explode(transform(probeSet, m => col("bucket").bitwiseXOR(m))).as("bucket"))
    v.join(broadcast(q), "bucket")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(graft.plans.VectorExpressions.cosineFused(col("qe"), col("e")), 6).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }

  /** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98):
    * diversified top-k — greedily pick the candidate maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-picked, so the
    * result set trades raw nearness for coverage (the diversity knob
    * retrieval-augmented sampling and eval-set construction need; a
    * plain top-k returns k near-duplicates of each other).
    *
    * Engine-parity arithmetic: λ is an integer percent `lambdaPct` in
    * [1,100]; relevance and pairwise similarity enter as FLOOR(cos·10^6)
    * micros, and the selection score is the BIGINT
    * `lambdaPct·rel_u − (100−lambdaPct)·maxsim_u` — the same argmax as
    * the real-valued MMR (positive scale factor), with no float
    * comparison anywhere in the greedy. Ties break by vec_id.
    *
    * Scale: candidates are the top-`kCand` of the exact baseline (swap
    * in the IVF/LSH candidate frame for huge corpora — the greedy only
    * needs (vec_id, rel_u, e)); the greedy runs PER QUERY GROUP over a
    * bounded kCand-sized list after ONE qid-keyed shuffle
    * (flatMapGroups) — k·kCand² integer work per query, never a
    * driver loop, never a cross-query barrier. */
  def mmrTopK(vectors: DataFrame, queries: DataFrame, k: Int = 10,
      kCand: Int = 50, lambdaPct: Int = 50): DataFrame = {
    require(kCand >= k, s"need kCand >= k, got k=$k kCand=$kCand")
    mmrFromCandidates(bruteForceTopK(vectors, queries, kCand), vectors, k, lambdaPct)
  }

  /** The MMR greedy over ANY candidate frame (qid, vec_id, sim) — the
    * scale entry point: feed it `Ivf.topK`/`lshTopK`/`Pq.topK` output
    * (all share the (qid, vec_id, sim, rk) contract) and the corpus
    * never meets a BroadcastNestedLoopJoin; [[mmrTopK]] is this with the
    * exact baseline as the candidate stage. SimilaritySpec proves the
    * two agree when fed the same candidates. */
  def mmrFromCandidates(candidates: DataFrame, vectors: DataFrame,
      k: Int = 10, lambdaPct: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPct >= 1 && lambdaPct <= 100,
      s"lambdaPct must be in [1,100], got $lambdaPct")
    val spark = vectors.sparkSession
    import spark.implicits._
    val cand = candidates
      .join(vectors.select(col("vec_id"), toDouble(col("embedding")).as("e")),
        Seq("vec_id"))
      .select(col("qid").cast("long").as("qid"), col("vec_id").cast("long").as("vec_id"),
        floor(col("sim") * lit(1000000.0d)).cast("long").as("rel_u"), col("e"))
      .as[MmrCand]
    cand.groupByKey(_.qid)
      .flatMapGroups((qid, it) => mmrGreedy(qid, it.toSeq, k, lambdaPct))
      .toDF()
  }

  private[graft] case class MmrCand(qid: Long, vec_id: Long, rel_u: Long, e: Seq[Double])
  private[graft] case class MmrHit(qid: Long, vec_id: Long, score_u: Long, rank: Long)

  /** Sequential-sum cosine in micros — floor(cos·10^6), matching the
    * oracle's floor(list_sum(...)/(sqrt·sqrt)·10^6) term for term. */
  private def simU(a: Seq[Double], b: Seq[Double]): Long = {
    // fail loudly on mixed-dimension candidate frames — a silent
    // truncated dot product picks a WRONG diversified set (same
    // contract as Pca.project's dimension check)
    require(a.length == b.length,
      s"simU: embedding dimension mismatch (${a.length} vs ${b.length})")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = a.length
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0d).toLong
  }

  private def mmrGreedy(qid: Long, cands: Seq[MmrCand], k: Int,
      lp: Int): Seq[MmrHit] = {
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    val out = scala.collection.mutable.ArrayBuffer.empty[MmrHit]
    var rank = 1L
    while (rank <= k && remaining.nonEmpty) {
      var bestIdx = -1; var bestScore = Long.MinValue; var bestId = Long.MaxValue
      var i = 0
      while (i < remaining.length) {
        val c = remaining(i)
        val maxSim = if (selVecs.isEmpty) 0L else selVecs.map(simU(c.e, _)).max
        val score = lp.toLong * c.rel_u - (100L - lp) * maxSim
        if (score > bestScore || (score == bestScore && c.vec_id < bestId)) {
          bestScore = score; bestId = c.vec_id; bestIdx = i
        }
        i += 1
      }
      val picked = remaining.remove(bestIdx)
      selVecs += picked.e
      out += MmrHit(qid, picked.vec_id, bestScore, rank)
      rank += 1
    }
    out.toSeq
  }
}
