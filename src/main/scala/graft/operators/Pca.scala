package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * step of embedding post-processing (compact vectors for ANN shards,
  * whitening before clustering, variance diagnostics).
  *
  * Distribution shape (the only one that makes sense at 100 TB): ONE corpus
  * pass accumulates the d-vector sum and the d×d Gramian per partition
  * (`treeAggregate` — d=64 → 64·65/2 upper-triangle doubles per partition,
  * merged in O(log P) tree rounds), the covariance eigendecomposition runs
  * on the DRIVER (a d×d symmetric problem — microseconds, data-size-free),
  * and the projection is a MAP-SIDE expression over driver-embedded
  * component literals (zero exchanges, like Ivf's nearest-centroid assign).
  * The corpus is never shuffled, never exploded per-dimension.
  *
  * This is the one operator family using an RDD fold: a Gramian is genuine
  * per-partition imperative accumulation (d²/2 fused multiply-adds per row
  * into one shared buffer) — a (i,j)-posexplode would materialize d² rows
  * per vector just to partial-aggregate them back down.
  *
  * Eigensolver: cyclic Jacobi rotations (Golub & Van Loan §8.5 — the
  * textbook symmetric eigensolver), deterministic sweep order, eigenpairs
  * sorted by eigenvalue descending (ties by original index), each
  * component's sign fixed so its largest-|x| coordinate is positive —
  * reproducible across runs up to float-sum reassociation.
  *
  * NULL embeddings are excluded (no position in the space — the Ivf.assign
  * rule); rows with a different dimensionality fail loudly in the fold.
  */
object Pca {

  /** Driver-held PCA model: `mean` (d), `components` (k rows × d, row j =
    * eigenvector of the j-th largest eigenvalue), `eigenvalues` (ALL d,
    * descending — the spectrum beyond k feeds variance accounting),
    * `totalVar` = trace of the covariance = Σ eigenvalues. */
  final case class Model(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVar: Double) {
    def k: Int = components.length
    def d: Int = mean.length
    /** Σ of the top-k eigenvalues = variance captured by `components`. */
    def capturedVar: Double = eigenvalues.take(k).sum
  }

  /** One-pass mean + covariance, then the driver-side eigensolve. */
  def train(vectors: DataFrame, k: Int, embCol: String = "embedding"): Model = {
    require(k > 0, s"k must be positive, got $k")
    val rows = vectors.select(col(embCol)).filter(col(embCol).isNotNull)
      .rdd.map(_.getSeq[Float](0))
    val d0 = rows.take(1).headOption
      .getOrElse(throw new IllegalArgumentException("PCA on an empty frame")).length
    require(k <= d0, s"k=$k exceeds dimensionality d=$d0")
    val tri = d0 * (d0 + 1) / 2
    // acc = (n, sum[d], upper-triangle gramian[d(d+1)/2])
    val zero = (0L, new Array[Double](d0), new Array[Double](tri))
    val (n, s, g) = rows.treeAggregate(zero)(
      seqOp = { case ((n, s, g), v) =>
        require(v.length == d0, s"embedding dim ${v.length} != $d0")
        var i = 0
        var t = 0
        while (i < d0) {
          val xi = v(i).toDouble
          s(i) += xi
          var j = i
          while (j < d0) { g(t) += xi * v(j).toDouble; j += 1; t += 1 }
          i += 1
        }
        (n + 1L, s, g)
      },
      combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
        var i = 0
        while (i < d0) { s1(i) += s2(i); i += 1 }
        var t = 0
        while (t < tri) { g1(t) += g2(t); t += 1 }
        (n1 + n2, s1, g1)
      })
    require(n > 0, "PCA on an empty frame")
    val mean = s.map(_ / n)
    // C = E[xxᵀ] − μμᵀ (population covariance — consistent with the /n
    // moments the gates recompute in-query)
    val c = Array.ofDim[Double](d0, d0)
    var t = 0
    var i = 0
    while (i < d0) {
      var j = i
      while (j < d0) {
        val v = g(t) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
        j += 1; t += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(c)
    Model(mean, eigVecs.take(k), eigVals, eigVals.sum)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues descending,
    * eigenvectors as ROWS in the same order, sign-fixed largest-|x|
    * coordinate positive). Deterministic: fixed (p,q) sweep order, fixed
    * convergence bound, index tie-breaks. */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]], maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-14 * math.max(1.0, a0.map(_.map(math.abs).max).max)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > eps) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > eps) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tt = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val cth = 1.0 / math.sqrt(tt * tt + 1.0)
            val sth = tt * cth
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = cth * arp - sth * arq
              a(r)(q) = sth * arp + cth * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = cth * apr - sth * aqr
              a(q)(r) = sth * apr + cth * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = cth * vrp - sth * vrq
              v(r)(q) = sth * vrp + cth * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      // sign fix: largest-|x| coordinate positive (first index on ties)
      val mi = col.indices.maxBy(j => (math.abs(col(j)), -j))
      if (col(mi) < 0.0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }

  /** Map-side projection: per row the k scores ⟨x − μ, v_j⟩, computed as
    * ⟨x, v_j⟩ − ⟨μ, v_j⟩ with the component and the scalar offset embedded
    * as literals — one whole-stage-codegen'd projection, no shuffle, no
    * join (the tiny-static-model / huge-corpus distribution, like
    * bpeEncode). Emits every input column plus `scores` (array<double>,
    * length k); NULL embeddings get NULL scores; an embedding whose
    * length differs from the model's d fails LOUDLY — zip_with would pad
    * with NULLs and the row would sail through as silent missing data,
    * the mismatch train() already rejects. */
  def project(vectors: DataFrame, m: Model, embCol: String = "embedding"): DataFrame = {
    val d = m.mean.length
    val e = col(embCol)
    val checked = when(size(e) === d, e).otherwise(raise_error(concat(
      lit(s"Pca.project: embedding dim "), size(e).cast("string"),
      lit(s" != model d=$d"))))
    val scores = m.components.map { comp =>
      val offset = comp.zip(m.mean).map { case (c, mu) => c * mu }.sum
      aggregate(
        zip_with(checked, typedLit(comp.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x) - lit(offset)
    }
    vectors.withColumn("scores",
      when(e.isNull, lit(null).cast("array<double>")).otherwise(array(scores: _*)))
  }

  /** Squared reconstruction residual per row: ‖x−μ‖² − Σ scoresⱼ² (exact
    * for orthonormal components — the Pythagorean split the gate entry
    * checks against the eigen-spectrum). Adds `residual` (double). */
  def residuals(projected: DataFrame, m: Model, embCol: String = "embedding"): DataFrame = {
    val e = col(embCol)
    val sqCentered = aggregate(
      zip_with(e, typedLit(m.mean.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val sqScores = aggregate(
      zip_with(col("scores"), col("scores"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    projected.withColumn("residual", sqCentered - sqScores)
  }

  /** Deterministic random projection (Johnson–Lindenstrauss): project to
    * `outDims` dimensions through a data-INDEPENDENT md5-derived matrix —
    * the oblivious companion to [[train]]: no training pass, no d²
    * driver state, and a new shard projects identically with zero
    * coordination, which is what a 100 TB map-side dimension reduction
    * needs. Matrix entries follow the HyperplaneSketch derivation family:
    * r(j)(i) = uint32(md5("rp:j:i")) / 2³² − 0.5 — reproducible from the
    * formula alone in any engine, no RNG state to ship.
    *
    * Outputs integer MICRO scores (floor(y·10⁶ + 0.5), the engine-parity
    * quantization rule) so cross-engine comparison is exact; the raw
    * doubles agree too (both engines fold the identical product list
    * left-to-right), but integers keep the oracle hash stable.
    * Map-side only — one projection, no shuffle, scan speed. */
  def randomProjection(vectors: DataFrame, d: Int, outDims: Int,
      embCol: String = "embedding"): DataFrame = {
    require(d > 0 && outDims > 0, s"dims must be positive, got d=$d out=$outDims")
    val matrix: Seq[Seq[Double]] = (0 until outDims).map { j =>
      (0 until d).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"rp:$j:$i".getBytes("UTF-8"))
        val u32 = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
          ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
        u32.toDouble / 4294967296.0 - 0.5
      }
    }
    val e = graft.functions.VectorFunctions.toDouble(col(embCol))
    val bound = vectors.select(col("vec_id"), e.as("__e"))
    val ys = matrix.zipWithIndex.map { case (row, j) =>
      floor(aggregate(
        zip_with(col("__e"), typedLit(row), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x) * lit(1e6) + lit(0.5))
        .cast("long").as(s"y${j}_micro")
    }
    bound.select((col("vec_id") +: ys): _*)
  }
}
