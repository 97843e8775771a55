package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca
import graft.tables.Tables

/** Distributed PCA (operators.Pca): eigensolver correctness, orthonormality,
  * the variance-decomposition identities the gate entry relies on, and the
  * map-side projection contract. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("jacobiEigen: known 2x2 spectrum, descending order, sign fix") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - r) < 1e-12 && math.abs(vecs(0)(1) - r) < 1e-12)
    // second vector sign-fixed: largest-|x| coordinate (first on tie) positive
    assert(math.abs(vecs(1)(0) - r) < 1e-12 && math.abs(vecs(1)(1) + r) < 1e-12)
  }

  test("rank-1 data: top component is the data direction, residual ~ 0 at k=1") {
    import spark.implicits._
    val df = (0 until 8).map(i => (i.toLong, Seq(i.toFloat, i.toFloat)))
      .toDF("vec_id", "embedding")
    val m = Pca.train(df, k = 1)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(m.components(0)(0) - r) < 1e-9)
    assert(math.abs(m.components(0)(1) - r) < 1e-9)
    assert(m.eigenvalues(1) < 1e-9) // second direction carries nothing
    val resid = Pca.residuals(Pca.project(df, m), m)
      .agg(avg(col("residual"))).collect()(0).getDouble(0)
    assert(math.abs(resid) < 1e-9)
  }

  test("real embeddings: components orthonormal, eigenvalues descending and >= 0") {
    val m = Pca.train(Tables.embeddings(spark, dir), k = 8)
    for (i <- m.components.indices; j <- i until m.k) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"V[$i]·V[$j]")
    }
    for (i <- 0 until m.eigenvalues.length - 1)
      assert(m.eigenvalues(i) >= m.eigenvalues(i + 1) - 1e-12, s"eig order at $i")
    assert(m.eigenvalues.last > -1e-9) // PSD up to float error
  }

  test("variance decomposition: data moments match the model spectrum") {
    val emb = Tables.embeddings(spark, dir)
    val m = Pca.train(emb, k = 8)
    val stats = Pca.residuals(Pca.project(emb, m), m)
      .agg(
        avg(aggregate(zip_with(col("embedding"), typedLit(m.mean.toSeq),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)).as("avg_sq"),
        avg(col("residual")).as("avg_resid"))
      .collect()(0)
    val avgSq = stats.getDouble(0)
    val avgResid = stats.getDouble(1)
    assert(math.abs(avgSq - m.totalVar) < 1e-6 * m.totalVar)
    val expectResid = m.totalVar - m.capturedVar
    assert(math.abs(avgResid - expectResid) < 1e-6 * m.totalVar)
    assert(avgResid > -1e-9)
  }

  test("k = d reconstructs exactly (residual ~ 0)") {
    val emb = Tables.embeddings(spark, dir)
    val m = Pca.train(emb, k = 64)
    val resid = Pca.residuals(Pca.project(emb, m), m)
      .agg(avg(col("residual"))).collect()(0).getDouble(0)
    assert(math.abs(resid) < 1e-6 * m.totalVar)
  }

  test("projection: scores length k, mean ~ 0 per component, NULL embedding -> NULL scores") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val m = Pca.train(emb, k = 4)
    val proj = Pca.project(emb, m)
    assert(proj.select(size(col("scores"))).distinct().collect().map(_.getInt(0)).toSeq === Seq(4))
    val means = proj.select((0 until 4).map(j => avg(element_at(col("scores"), j + 1))): _*)
      .collect()(0)
    for (j <- 0 until 4)
      assert(math.abs(means.getDouble(j)) < 1e-6 * math.max(1.0, m.totalVar), s"component $j")
    val withNull = Seq((0L, Option(Seq.fill(64)(1.0f))), (1L, None))
      .toDF("vec_id", "embedding")
    val got = Pca.project(withNull, m).select(col("vec_id"), col("scores")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got(0L) === false && got(1L) === true)
  }
  test("randomProjection: one-hot inputs recover the md5-derived matrix rows") {
    import spark.implicits._
    // x = e_i  ==>  y_j = r(j)(i); recompute the matrix entry by hand
    def entry(j: Int, i: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$j:$i".getBytes("UTF-8"))
      val u32 = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
        ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
      u32.toDouble / 4294967296.0 - 0.5
    }
    val d = 6
    val oneHots = (0 until d).map(i =>
      (i.toLong, Seq.tabulate(d)(x => if (x == i) 1.0f else 0.0f)))
    val got = Pca.randomProjection(oneHots.toDF("vec_id", "embedding"), d, outDims = 3)
      .collect().map(r => r.getLong(0) -> (1 to 3).map(c => r.getLong(c))).toMap
    for (i <- 0 until d; j <- 0 until 3) {
      val want = math.floor(entry(j, i) * 1e6 + 0.5).toLong
      assert(got(i.toLong)(j) === want, s"matrix entry ($j,$i)")
    }
  }
}
