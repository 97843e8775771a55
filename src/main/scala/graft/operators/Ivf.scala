package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.plans.VectorExpressions.{cosineFused, nearestCentroid}

/** IVF (inverted-file) ANN index built with deterministic k-means.
  *
  * Everything is DataFrame-native so it scales like any other aggregation:
  *  - init: centroid j = mean of vectors with vec_id % k == j (deterministic,
  *    no RNG — reproducible across runs/cluster sizes);
  *  - Lloyd iterations: assign is MAP-SIDE — centroids are k×dim doubles
  *    (driver-tiny), so the nearest-centroid argmax is one fused projection
  *    (plans.NearestCentroid), ZERO exchanges; recompute means via
  *    posexplode+groupBy (partial-aggregated);
  *  - search: probe the nprobe nearest centroids, exact-score only those
  *    inverted lists.
  *
  * At 100 TB the assign step reads the corpus once at scan speed (the
  * earlier crossJoin + `row_number over partitionBy(vec_id)` form shuffled
  * all N×k scored rows per Lloyd round) and the mean recompute is one
  * shuffle keyed by (cluster, dim) — no O(N²) anywhere.
  */
object Ivf {

  /** Driver-side centroid collect for the map-side assign: (cid, ce) rows →
    * parallel id/vector seqs sorted by cid ascending (the tie-break order).
    * Centroid frames here are k or O(k·rounds) rows — always tiny. */
  private def collectCentroids(centroids: DataFrame): (Seq[Long], Seq[Seq[Double]]) = {
    val rows = centroids.select(col("cid").cast("long"), col("ce")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
      .sortBy(_._1)
    (rows.map(_._1).toVector, rows.map(_._2).toVector)
  }

  /** Column-wise mean of `e` arrays per cluster id column `cid`. */
  private def centroidMeans(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("e")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cid"), transform(col("dm"), s => s.getField("m")).as("ce"))

  /** Assign each vector to its nearest centroid by cosine — one map-side
    * projection over the embedded centroid set, no exchange (ties →
    * smallest cid, identical to the former window form for every NON-NULL
    * vector — including its NaN-wins descending-sort rule). An empty
    * centroid set (empty corpus: the means of nothing) yields an empty
    * assignment, like the join form it replaced.
    *
    * NULL vectors are the ONE deliberate divergence from the replaced
    * crossJoin+row_number form: nullSafeEval yields a NULL struct, so the
    * row keeps cid NULL (and is skipped by centroid means / inverted
    * lists), whereas the window form's `sim NULL, NULLS LAST desc`
    * deterministically assigned the smallest cid. A NULL embedding has no
    * position in the space — excluding it is the honest semantics; callers
    * that need the old behavior must backfill cid themselves. Same rule in
    * Pq.assign. */
  private def assign(v: DataFrame, centroids: DataFrame): DataFrame = {
    val (ids, cents) = collectCentroids(centroids)
    val cidType = centroids.schema("cid").dataType
    if (ids.isEmpty)
      v.limit(0).select(col("vec_id"), col("e"), lit(null).cast(cidType).as("cid"))
    else
      v.withColumn("__nc", nearestCentroid(col("e"), ids, cents))
        .select(col("vec_id"), col("e"),
          col("__nc").getField("cid").cast(cidType).as("cid"))
  }

  private def lloyd(v: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    var centroids = init
    var i = 0
    while (i < iters) {
      val next = centroidMeans(assign(v, centroids)).persist()
      next.count() // materialize before releasing the previous iteration
      if (i > 0) centroids.unpersist(blocking = false)
      centroids = next
      i += 1
    }
    // final centroids stay persisted for the caller; register them so the
    // session-wide release contract (Dedup.releaseCaches) covers them
    if (iters > 0) Dedup.track(centroids) else centroids
  }

  /** Train k centroids with `iters` Lloyd iterations. Returns (cid, ce). */
  def train(vectors: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    // k=0 would make vec_id % k NULL (non-ANSI) and die later with an
    // opaque NPE in collectCentroids; negative k would mint negative cids
    require(k >= 1, s"k must be >= 1, got $k")
    val v = vectors.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    lloyd(v, centroidMeans(v.withColumn("cid", (col("vec_id") % k).cast("int"))), iters)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Scalable init + Lloyd: k-means||-style oversampling (Bahmani et al.,
    * VLDB'12) made DETERMINISTIC by replacing the sampling RNG with
    * xxhash64(vec_id, round) mapped to [0,1). Each round is ONE
    * broadcast-assign pass (select points with prob ≈ 2k·d/cost, d = cosine
    * distance to the nearest candidate) plus one scalar agg — unlike classic
    * k-means++ which needs k sequential full scans. The oversampled
    * candidate set (O(k·rounds) rows) is weighted by its attraction counts
    * and reduced to k seeds on the driver via weighted farthest-point.
    * At 100 TB: `rounds`+1 scans total, driver traffic is O(k·rounds·dim).
    */
  def trainScalable(vectors: DataFrame, k: Int, iters: Int = 2, rounds: Int = 3): DataFrame = {
    val spark0 = vectors.sparkSession
    import spark0.implicits._
    val v = vectors.select(col("vec_id"), toDouble(col("embedding")).as("e")).persist()
    val l = 2.0 * k
    // The candidate set lives ON THE DRIVER (a sorted vec_id -> vector
    // map): it is O(k·rounds) rows by construction and every round
    // needed it collected for the map-side assign anyway. Keeping it
    // driver-side deletes the per-round union+dropDuplicates exchanges,
    // the dists persists, and the final weights join — on a small SF the
    // fixed job/shuffle overhead WAS the training cost (round-8 bench:
    // 8.4 s for 2k vectors), and at 100 TB the corpus-sized passes
    // (`rounds` cost scans + `rounds` selection scans + 1 weight scan)
    // are unchanged. Selection math is byte-identical to the frame-based
    // form it replaces.
    val candMap = scala.collection.mutable.SortedMap.empty[Long, Vector[Double]]
    val seedRow = v.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("e")).collect()
    if (seedRow.isEmpty) {
      // empty corpus: no candidates, no centroids — empty frame with the
      // lloyd-init schema, like train() on an empty corpus
      v.unpersist(blocking = false)
      return Seq.empty[(Int, Seq[Double])].toDF("cid", "ce")
    }
    candMap(seedRow(0).getLong(0)) = seedRow(0).getSeq[Double](1).toVector
    var r = 0
    while (r < rounds) {
      // nearest-candidate distance is the same map-side argmax (min d =
      // max sim; d = 1 - sim is monotone on non-NaN sims) — the former
      // window form exchanged N×|cand| rows per round here too.
      // nanWins = false: the replaced window ordered d ASCENDING, where
      // NaN sorts LAST — a NaN candidate must lose here (the opposite of
      // assign's sim-descending rule), or one poisoned candidate turns
      // every distance and the round's cost sum into NaN
      val (cids, ces) = (candMap.keys.toVector, candMap.values.toVector)
      val dists = v
        .withColumn("__nc", nearestCentroid(col("e"), cids, ces, nanWins = false))
        .select(col("vec_id"), col("e"),
          (lit(1.0) - col("__nc").getField("sim")).as("d"))
      // SUM over an empty corpus is NULL — treat as zero cost (skip
      // selection) instead of an NPE. dists is NOT persisted: it is one
      // map-side projection over the cached v, cheaper to recompute for
      // the selection pass than to materialize.
      val costRow = dists.agg(sum(col("d"))).first()
      val cost = if (costRow.isNullAt(0)) 0.0 else costRow.getDouble(0)
      if (cost > 0) {
        dists
          .filter(pmod(xxhash64(col("vec_id"), lit(r)), lit(1000000L)) / 1000000.0 <
            col("d") * (l / cost))
          .select(col("vec_id"), col("e"))
          .collect() // expected ~2k rows per round (the oversampling l)
          .foreach(row => candMap(row.getLong(0)) = row.getSeq[Double](1).toVector)
      }
      r += 1
    }
    // weight candidates by attraction counts (one corpus scan, k·rounds-
    // bounded shuffle), reduce to k on the driver
    val candDf = candMap.toSeq.map { case (id, e) => (id, e: Seq[Double]) }
      .toDF("cid", "ce")
    val weights = assign(v, candDf).groupBy(col("cid")).agg(count(lit(1)).as("w"))
      .filter(col("cid").isNotNull) // NULL-embedding rows assign to no candidate
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    val pts = candMap.toArray
      .map { case (id, e) => (id, e.toArray, weights.getOrElse(id, 0L)) }
    val n = pts.length
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    chosen += pts.indices.maxBy(i => (pts(i)._3, -pts(i)._1))
    val dmin = Array.fill(n)(Double.MaxValue)
    while (chosen.size < math.min(k, n)) {
      val last = pts(chosen.last)._2
      var i = 0
      while (i < n) {
        dmin(i) = math.min(dmin(i), 1.0 - cosine(pts(i)._2, last)); i += 1
      }
      chosen += pts.indices
        .filterNot(chosen.contains)
        .maxBy(i => (pts(i)._3 * dmin(i), -pts(i)._1))
    }
    val init = chosen.zipWithIndex
      .map { case (pi, ci) => (ci, pts(pi)._2.toSeq) }.toSeq
      .toDF("cid", "ce")
    val result = lloyd(v, init, iters)
    // final centroids are materialized inside lloyd; the cached corpus can go
    v.unpersist(blocking = false)
    result
  }

  /** Index: every vector tagged with its cluster id. */
  def index(vectors: DataFrame, centroids: DataFrame): DataFrame =
    assign(vectors.select(col("vec_id"), toDouble(col("embedding")).as("e")), centroids)

  /** IVF top-k: probe the `nprobe` closest clusters per query, exact-score
    * only their lists. Same output contract as Similarity.bruteForceTopK. */
  def topK(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qe"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("csim", cosineFused(col("qe"), col("ce")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qe"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    probes.join(indexed, "cid")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), round(cosineFused(col("qe"), col("e")), 6).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }
}
