package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the memory-bound ANN representation:
  * each l2-normalized vector is split into `m` contiguous sub-blocks and
  * every block is replaced by the id of its nearest sub-centroid, so a
  * dim-D float vector compresses to m small codes (ints < ksub in the
  * schema; parquet's dictionary/bit-pack encodings store them in ~log2
  * ksub bits at rest, which is where the 16× size reduction lands).
  * Queries score compressed vectors with an ADC (asymmetric distance
  * computation) lookup table — dot(query_block, sub_centroid) summed over
  * blocks — then the top candidates are re-ranked exactly.
  *
  * Everything is DataFrame-native and deterministic (init = vec_id % ksub
  * per block, no RNG), like Ivf:
  *  - train: per-block k-means — assign via broadcast codebook join +
  *    argmin window, means via posexplode + partial-aggregated groupBy;
  *  - encode: one broadcast-join pass → (vec_id, m codes);
  *  - search: LUT is queries × codebook (tiny, broadcast); scoring joins
  *    the exploded codes to the LUT and partial-aggregates the per-block
  *    contributions — the shuffle carries one row per (query, vector),
  *    never the raw embeddings. Exact re-rank touches only rerank·k
  *    candidates per query.
  *
  * At 100 TB: codes are m bytes/vector (64x smaller than float32 dim-64),
  * the codebook is m·ksub·(dim/m) doubles (broadcast), and the only wide
  * shuffle is the partial-aggregated ADC sum. Pair with Ivf to prune the
  * candidate set before ADC (classic IVF-PQ).
  */
object Pq {

  /** Per-block sub-vector rows over a PREPARED (vec_id, e) frame —
    * no normalization here: raw-vector PQ feeds l2-normalized vectors,
    * residual PQ feeds residuals that must NOT be re-normalized. */
  private def blocksOf(v: DataFrame, dim: Int, m: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m blocks")
    val sub = dim / m
    v.select(col("vec_id"),
      explode(array((0 until m).map(b =>
        struct(lit(b).as("b"), slice(col("e"), b * sub + 1, sub).as("sub"))): _*)).as("blk"))
      .select(col("vec_id"), col("blk.b").as("b"), col("blk.sub").as("sub"))
  }

  /** Per-block sub-vector rows: (vec_id, b, sub) with `sub` = the b-th
    * `dim/m`-length slice of the l2-normalized embedding. */
  private def blocks(vectors: DataFrame, dim: Int, m: Int): DataFrame = {
    // norm bound in its own projection before the normalize lambda
    // references it (fold-in-lambda re-evaluation cliff)
    val v = vectors.select(col("vec_id"), toDouble(col("embedding")).as("e0"))
      .withColumn("nrm", l2Norm(col("e0")))
      .select(col("vec_id"), l2NormalizeWith(col("e0"), col("nrm")).as("e"))
    blocksOf(v, dim, m)
  }

  /** Residual rows (vec_id, e) for IVF-residual-PQ: e = the vector's
    * l2-normalized form MINUS the l2-normalized coarse centroid of its
    * IVF cell. The decomposition q·v̂ = q·ĉ + q·r is EXACT for any fixed
    * per-cell reference ĉ (the probe already computes q·ĉ as its cosine,
    * |q|=|ĉ|=1), and quantizing r instead of v̂ is the classic IVF-PQ
    * residual trick (Jégou et al. §III): residuals concentrate near 0 so
    * the same ksub codes spend their resolution on a far smaller cell —
    * lower quantization error at identical index bytes. NULL-cid rows
    * (NULL embeddings) drop here, matching the non-residual path where
    * they never join a probe. */
  private def residualFrame(indexed: DataFrame, centroids: DataFrame): DataFrame = {
    val cu = centroids
      .withColumn("cnrm", l2Norm(col("ce")))
      .select(col("cid"), l2NormalizeWith(col("ce"), col("cnrm")).as("cu"))
    indexed
      .withColumn("nrm", l2Norm(col("e")))
      .select(col("vec_id"), col("cid"),
        l2NormalizeWith(col("e"), col("nrm")).as("en"))
      .join(broadcast(cu), "cid")
      .select(col("vec_id"), zip_with(col("en"), col("cu"), _ - _).as("e"))
  }

  /** Driver-side codebook collect for the map-side assign: (b, cid, ce)
    * rows → per-block id/centroid seqs indexed [b][code], codes sorted by
    * cid ascending (the tie-break order). The codebook is m·ksub rows —
    * always tiny. */
  private def collectCodebook(codebook: DataFrame): (Seq[Seq[Long]], Seq[Seq[Seq[Double]]]) = {
    val rows = codebook
      .select(col("b").cast("int"), col("cid").cast("long"), col("ce")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toVector))
    if (rows.isEmpty) return (Vector.empty, Vector.empty) // empty corpus
    val byBlock = rows.groupBy(_._1)
    val m = byBlock.keys.max + 1
    require(byBlock.keySet == (0 until m).toSet,
      s"codebook blocks must be contiguous 0..${m - 1}, got ${byBlock.keySet.toSeq.sorted}")
    val sorted = Vector.tabulate(m)(b => byBlock(b).sortBy(_._2))
    (sorted.map(_.map(_._2).toVector), sorted.map(_.map(_._3).toVector))
  }

  /** Nearest sub-centroid per (vector, block) by dot product (vectors are
    * l2-normalized, so summed block dots == cosine) — one map-side
    * projection over the embedded per-block codebook, no exchange (the
    * former broadcast-join + `row_number over partitionBy(vec_id, b)`
    * form shuffled all N×m×ksub scored rows per Lloyd round). NULL
    * sub-vectors keep cid NULL (nullSafeEval) rather than the window
    * form's smallest-cid fallback — the same deliberate NULL-embedding
    * divergence Ivf.assign documents. */
  private def assign(blk: DataFrame, codebook: DataFrame,
      l2: Boolean = false): DataFrame = {
    val (ids, cents) = collectCodebook(codebook)
    val cidType = codebook.schema("cid").dataType
    if (ids.isEmpty) // empty corpus -> empty codebook -> empty assignment
      blk.limit(0).select(col("vec_id"), col("b"), col("sub"),
        lit(null).cast(cidType).as("cid"), lit(null).cast("double").as("dot"))
    else if (!l2)
      blk.withColumn("__nc",
          graft.plans.VectorExpressions.nearestSubCentroid(col("sub"), col("b"), ids, cents))
        .select(col("vec_id"), col("b"), col("sub"),
          col("__nc").getField("cid").cast(cidType).as("cid"),
          col("__nc").getField("dot").as("dot"))
    else {
      // L2-nearest assignment (residual PQ): argmin ||s − c||² =
      // argmax (s·c − ||c||²/2), folded into the SAME fused max-dot
      // expression by the classic augmentation — append 1.0 to the
      // sub-vector and −||c||²/2 to each centroid. Max-dot assignment is
      // right for raw l2-normalized vectors (serve scores dots of
      // near-constant-norm slices) but degenerate for residuals centered
      // near 0, where it chases centroid NORM and ignores the distance —
      // measured recall 0.375 vs 0.44 before this branch existed.
      val cents2 = cents.map(_.map(cs => cs :+ (-0.5 * cs.map(x => x * x).sum)))
      blk.withColumn("__s2", concat(col("sub"), array(lit(1.0d))))
        .withColumn("__nc",
          graft.plans.VectorExpressions.nearestSubCentroid(col("__s2"), col("b"), ids, cents2))
        .select(col("vec_id"), col("b"), col("sub"),
          col("__nc").getField("cid").cast(cidType).as("cid"),
          col("__nc").getField("dot").as("dot"))
    }
  }

  /** Column-wise mean per (block, code) — the Lloyd update. */
  private def means(assigned: DataFrame): DataFrame =
    assigned
      .select(col("b"), col("cid"), posexplode(col("sub")).as(Seq("dim", "x")))
      .groupBy(col("b"), col("cid"), col("dim"))
      .agg(avg(col("x")).as("mu"))
      .groupBy(col("b"), col("cid"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mu")))).as("dm"))
      .select(col("b"), col("cid"), transform(col("dm"), s => s.getField("mu")).as("ce"))

  /** Lloyd over pre-sliced block rows — shared by raw-vector and
    * residual training. Deterministic init — sub-centroid j of block b =
    * mean of blocks with vec_id % ksub == j. */
  private def trainOn(blkSrc: DataFrame, ksub: Int, iters: Int,
      l2: Boolean = false): DataFrame = {
    val blk = blkSrc.persist()
    try {
      var codebook = means(blk.withColumn("cid", (col("vec_id") % ksub).cast("int")))
        .persist()
      codebook.count()
      var i = 0
      while (i < iters) {
        val next = means(assign(blk, codebook, l2)).persist()
        next.count()
        codebook.unpersist(blocking = false)
        codebook = next
        i += 1
      }
      // the returned codebook stays persisted for the caller; registering
      // it lets Dedup.releaseCaches/releaseSince drain it (Bench's settle
      // isolation and Verify both rely on the registry being exhaustive)
      Dedup.track(codebook)
    } finally { blk.unpersist(blocking = false); () }
  }

  /** Train the per-block codebooks: (b, cid, ce). */
  def train(vectors: DataFrame, dim: Int, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): DataFrame =
    trainOn(blocks(vectors, dim, m), ksub, iters)

  /** Train per-block codebooks over IVF-cell RESIDUALS (see
    * [[residualFrame]]). `indexed`/`centroids` are Ivf.index / Ivf.train*
    * output over the corpus this codebook will encode. */
  def trainResidual(indexed: DataFrame, centroids: DataFrame, dim: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 2): DataFrame =
    trainOn(blocksOf(residualFrame(indexed, centroids), dim, m), ksub, iters,
      l2 = true)

  private def codesOf(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("b"), col("cid")))).as("bc"))
      .select(col("vec_id"), transform(col("bc"), s => s.getField("cid")).as("codes"))

  /** Encode every vector to its m codes: (vec_id, codes) with
    * codes[b] = nearest sub-centroid id of block b. */
  def encode(vectors: DataFrame, codebook: DataFrame, dim: Int, m: Int = 8): DataFrame =
    codesOf(assign(blocks(vectors, dim, m), codebook))

  /** Encode every vector's RESIDUAL to its m codes (the index the
    * residual serve path reads; codebook from [[trainResidual]]). */
  def encodeResidual(indexed: DataFrame, centroids: DataFrame,
      codebook: DataFrame, dim: Int, m: Int = 8): DataFrame =
    codesOf(assign(blocksOf(residualFrame(indexed, centroids), dim, m), codebook,
      l2 = true))

  /** l2-normalized query frame (qid, qe). */
  private def normQueries(queries: DataFrame): DataFrame =
    queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("q0"))
      .withColumn("nrm", l2Norm(col("q0")))
      .select(col("qid"), l2NormalizeWith(col("q0"), col("nrm")).as("qe"))

  /** ADC lookup table (qid, b, cid, contrib) — queries × codebook, tiny. */
  private def lutFor(q: DataFrame, codebook: DataFrame, dim: Int, m: Int): DataFrame = {
    val sub = dim / m
    q.select(col("qid"),
      explode(array((0 until m).map(b =>
        struct(lit(b).as("b"), slice(col("qe"), b * sub + 1, sub).as("qsub"))): _*)).as("blk"))
      .select(col("qid"), col("blk.b").as("b"), col("blk.qsub").as("qsub"))
      .join(codebook, "b")
      .withColumn("contrib", aggregate(zip_with(col("qsub"), col("ce"), _ * _),
        lit(0.0), _ + _))
      .select(col("qid"), col("b"), col("cid"), col("contrib"))
  }

  /** Keep each query's ADC top rerank·k, re-score those exactly (true
    * cosine on the raw embeddings), return the top k — the
    * Similarity.bruteForceTopK output contract (qid, vec_id, sim, rk).
    * The re-rank deliberately uses the RAW query embedding, exactly like
    * bruteForceTopK: cosine is scale-invariant, but scoring against the
    * pre-normalized form would differ by ~1 ulp and could flip a HALF_UP
    * round-6 tie — the rounding-tie divergence class the repo treats as a
    * bug (see Dedup's unrounded-jaccard note). */
  private def rerankExact(adc: DataFrame, queries: DataFrame, vectors: DataFrame,
      k: Int, rerank: Int): DataFrame = {
    // round the ADC score before ordering: the sum's partial-agg addition
    // order is shuffle-nondeterministic, and an unrounded float rank can
    // flip which of two near-tied candidates crosses the rerank boundary
    // between runs — the same unrounded-ranking class rerank itself fixes
    val wa = Window.partitionBy(col("qid"))
      .orderBy(round(col("adc"), 6).desc, col("vec_id"))
    val cand = adc.withColumn("crk", row_number().over(wa))
      .filter(col("crk") <= k * rerank)
      .select(col("qid"), col("vec_id"))
    val ve = vectors.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val qr = queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qraw"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    cand.join(ve, "vec_id")
      .join(qr, "qid")
      .select(col("qid"), col("vec_id"),
        round(graft.plans.VectorExpressions.cosineFused(col("qraw"), col("e")), 6).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }

  /** ADC top-k with exact re-rank: score codes against the per-query
    * lookup table, take `rerank`·k ADC candidates, re-score those exactly
    * (true cosine on the raw embeddings), return the top k.
    * Output contract matches Similarity.bruteForceTopK (qid, vec_id, sim,
    * rk) so recall is directly comparable. */
  def topK(codes: DataFrame, codebook: DataFrame, vectors: DataFrame,
      queries: DataFrame, dim: Int, k: Int, m: Int = 8, rerank: Int = 4): DataFrame = {
    val q = normQueries(queries)
    val lut = lutFor(q, codebook, dim, m)
    // ADC: explode codes once, join the broadcast LUT, partial-agg the sum
    val adc = codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("b", "cid")))
      .join(broadcast(lut), Seq("b", "cid"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("contrib")).as("adc"))
    rerankExact(adc, queries, vectors, k, rerank)
  }

  /** IVF-PQ (the composition the FAISS stack standardized): probe the
    * `nprobe` nearest coarse centroids per query, ADC-score ONLY the
    * probed inverted lists' codes, exact-re-rank the ADC top rerank·k.
    * `indexed`/`centroids` are Ivf.index / Ivf.train* output; `codes`/
    * `codebook` are encode/train output over the same corpus.
    *
    * At 100 TB this stacks both prunings: the coarse probe cuts the
    * scored set from N to the probed lists (≈ nprobe/k_coarse of the
    * corpus), and within those lists the scored representation is m bytes
    * per vector (codes ⋈ broadcast LUT — raw embeddings are read only for
    * the rerank·k finalists). The only corpus-sized shuffle keys on
    * vec_id (codes ⋈ probed-candidate pairs). */
  /** Coarse probe + candidate pairs, shared by the raw and residual
    * serve paths: the nprobe nearest centroids per normalized query, then
    * the probed lists' members with self-pairs dropped. The coarse cid is
    * dropped from the output so the LUT's sub-centroid cid downstream
    * cannot collide with it; `keepCsim` carries the probe's exact q·ĉ
    * through for the residual decomposition. */
  private def probedPairs(q: DataFrame, centroids: DataFrame, indexed: DataFrame,
      nprobe: Int, keepCsim: Boolean): DataFrame = {
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid").asc)
    val extra = if (keepCsim) Seq(col("csim")) else Nil
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("csim", graft.plans.VectorExpressions.cosineFused(col("qe"), col("ce")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nprobe)
      .select(Seq(col("qid"), col("cid")) ++ extra: _*)
    probes.join(indexed.select(col("vec_id"), col("cid")), "cid")
      .filter(col("qid") =!= col("vec_id"))
      .select(Seq(col("qid"), col("vec_id")) ++ extra: _*)
  }

  def ivfPqTopK(indexed: DataFrame, centroids: DataFrame, codes: DataFrame,
      codebook: DataFrame, vectors: DataFrame, queries: DataFrame,
      dim: Int, k: Int, nprobe: Int, m: Int = 8, rerank: Int = 4): DataFrame = {
    val q = normQueries(queries)
    val pairs = probedPairs(q, centroids, indexed, nprobe, keepCsim = false)
    val lut = lutFor(q, codebook, dim, m)
    val adc = pairs.join(codes, "vec_id")
      .select(col("qid"), col("vec_id"), posexplode(col("codes")).as(Seq("b", "cid")))
      .join(broadcast(lut), Seq("qid", "b", "cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("contrib")).as("adc"))
    rerankExact(adc, queries, vectors, k, rerank)
  }

  /** IVF-PQ over RESIDUAL codes: same probe + ADC + exact-rerank shape as
    * [[ivfPqTopK]], but the approximate score decomposes as
    * q·v̂ ≈ q·ĉ + Σ_b LUT(q, b, code_b) — the probe's cosine IS the exact
    * q·ĉ term (both sides unit-norm), and the LUT scores the quantized
    * residual (codebook/codes from [[trainResidual]]/[[encodeResidual]]).
    * Same index bytes, lower quantization error (PqSpec measures the ADC
    * error drop vs raw-vector codes on the same geometry).
    *
    * Scale story is ivfPqTopK's unchanged: the only corpus-sized shuffle
    * keys on vec_id; the per-pair ĉ term rides the probe join (nprobe
    * rows per query, already broadcast). */
  def ivfPqResidualTopK(indexed: DataFrame, centroids: DataFrame, codes: DataFrame,
      codebook: DataFrame, vectors: DataFrame, queries: DataFrame,
      dim: Int, k: Int, nprobe: Int, m: Int = 8, rerank: Int = 4): DataFrame = {
    val q = normQueries(queries)
    // each vector lives in exactly ONE inverted list, so (qid, vec_id)
    // carries a single q·ĉ value — max() below is a no-op pick, not a
    // choice among competing cells
    val pairs = probedPairs(q, centroids, indexed, nprobe, keepCsim = true)
    val lut = lutFor(q, codebook, dim, m)
    val adc = pairs.join(codes, "vec_id")
      .select(col("qid"), col("vec_id"), col("csim"),
        posexplode(col("codes")).as(Seq("b", "cid")))
      .join(broadcast(lut), Seq("qid", "b", "cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg((max(col("csim")) + sum(col("contrib"))).as("adc"))
    rerankExact(adc, queries, vectors, k, rerank)
  }
}
