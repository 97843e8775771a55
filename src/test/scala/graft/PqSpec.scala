package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Pq, Similarity}
import graft.tables.Tables

class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("codebook shape: m blocks x ksub centroids x dim/m dims") {
    val emb = Tables.embeddings(spark, dir)
    val cb = Pq.train(emb, dim = 64, m = 8, ksub = 16, iters = 1)
    val rows = cb.collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet.size === rows.length)
    assert(rows.map(_.getInt(0)).toSet === (0 until 8).toSet)
    assert(rows.forall(_.getSeq[Double](2).length === 8))
    // every sub-centroid id is in range (codes stay one small int)
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 16))
  }

  test("encode: one code per block, rerun-identical") {
    val emb = Tables.embeddings(spark, dir)
    val cb = Pq.train(emb, dim = 64, m = 8, ksub = 16, iters = 1).persist()
    def codesMap() = Pq.encode(emb, cb, dim = 64, m = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val c1 = codesMap()
    assert(c1.nonEmpty && c1.values.forall(c => c.length === 8 && c.forall(x => x >= 0 && x < 16)))
    assert(c1 === codesMap())
    cb.unpersist()
  }

  test("ADC + exact re-rank recall >= 0.8 vs brute force (swept config)") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 20)
    val cb = Pq.train(emb, dim = 64, m = 32, ksub = 16, iters = 2)
    val codes = Pq.encode(emb, cb, dim = 64, m = 32)
    val pq = Pq.topK(codes, cb, emb, q, dim = 64, k = 10, m = 32, rerank = 8)
      .select(col("qid"), col("vec_id")).withColumn("hit", lit(1))
    val r = Similarity.bruteForceTopK(emb, q, 10)
      .select(col("qid"), col("vec_id"))
      .join(pq, Seq("qid", "vec_id"), "left")
      .agg(count(lit(1)), sum(coalesce(col("hit"), lit(0)))).collect()(0)
    val recall = r.getLong(1).toDouble / r.getLong(0)
    assert(recall >= 0.8, s"PQ recall $recall below gate") // measured 0.945 here
  }

  test("IVF-PQ: recall >= 0.8 vs brute force; scored set is only the probed lists") {
    import graft.operators.Ivf
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 20)
    val cents = Ivf.trainScalable(emb, 16, iters = 1, rounds = 2)
    val idx = Ivf.index(emb, cents).persist()
    val cb = Pq.train(emb, dim = 64, m = 32, ksub = 16, iters = 2)
    val codes = Pq.encode(emb, cb, dim = 64, m = 32)
    val got = Pq.ivfPqTopK(idx, cents, codes, cb, emb, q,
      dim = 64, k = 10, nprobe = 12, m = 32, rerank = 8)
      .select(col("qid"), col("vec_id")).withColumn("hit", lit(1))
    val r = Similarity.bruteForceTopK(emb, q, 10)
      .select(col("qid"), col("vec_id"))
      .join(got, Seq("qid", "vec_id"), "left")
      .agg(count(lit(1)), sum(coalesce(col("hit"), lit(0)))).collect()(0)
    val recall = r.getLong(1).toDouble / r.getLong(0)
    assert(recall >= 0.8, s"IVF-PQ recall $recall below gate")
    // coarse pruning is real: at nprobe=1 every hit lives in the single
    // probed (nearest-centroid) list of its query
    val vecCid = idx.select(col("vec_id"), col("cid")).collect()
      .map(r2 => r2.getLong(0) -> r2.getInt(1)).toMap
    val qCid = Ivf.index(q, cents).select(col("vec_id"), col("cid")).collect()
      .map(r2 => r2.getLong(0) -> r2.getInt(1)).toMap
    val one = Pq.ivfPqTopK(idx, cents, codes, cb, emb, q,
      dim = 64, k = 10, nprobe = 1, m = 32, rerank = 8)
      .select(col("qid"), col("vec_id")).collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1)))
    idx.unpersist()
    assert(one.nonEmpty)
    assert(one.forall { case (qid, vid) => vecCid(vid) == qCid(qid) })
  }

  test("re-ranked hits carry EXACT cosine (same sim as brute force on shared pairs)") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 5)
    val cb = Pq.train(emb, dim = 64, m = 8, ksub = 16, iters = 1)
    val codes = Pq.encode(emb, cb, dim = 64, m = 8)
    val pq = Pq.topK(codes, cb, emb, q, dim = 64, k = 10, m = 8, rerank = 4)
      .select(col("qid"), col("vec_id"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select(col("qid"), col("vec_id"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = pq.keySet intersect exact.keySet
    assert(shared.nonEmpty)
    shared.foreach(k => assert(pq(k) === exact(k)))
  }

  test("train rejects a dim that does not divide into m blocks") {
    val emb = Tables.embeddings(spark, dir)
    intercept[IllegalArgumentException] { Pq.train(emb, dim = 64, m = 7) }
  }

  test("residual IVF-PQ: recall >= 0.8; residual codes beat raw codes at rerank=1") {
    import graft.operators.Ivf
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 20)
    val cents = Ivf.trainScalable(emb, 16, iters = 1, rounds = 2)
    val idx = Ivf.index(emb, cents).persist()
    val gold = Similarity.bruteForceTopK(emb, q, 10)
      .select(col("qid"), col("vec_id"))
    def recallOf(topk: org.apache.spark.sql.DataFrame): Double = {
      val hit = topk.select(col("qid"), col("vec_id")).withColumn("hit", lit(1))
      val r = gold.join(hit, Seq("qid", "vec_id"), "left")
        .agg(count(lit(1)), sum(coalesce(col("hit"), lit(0)))).collect()(0)
      r.getLong(1).toDouble / r.getLong(0)
    }
    // residual path at the production geometry
    val cbR = Pq.trainResidual(idx, cents, dim = 64, m = 32, ksub = 16, iters = 2)
    val codesR = Pq.encodeResidual(idx, cents, cbR, dim = 64, m = 32)
    val recR = recallOf(Pq.ivfPqResidualTopK(idx, cents, codesR, cbR, emb, q,
      dim = 64, k = 10, nprobe = 12, m = 32, rerank = 8))
    assert(recR >= 0.8, s"residual IVF-PQ recall $recR below gate")
    // the residual claim itself — same geometry, rerank=1 so the ADC
    // ordering (not the exact re-score) decides recall: quantizing the
    // cell-centered residual spends the same ksub codes on a smaller
    // spread, so its ADC ranks at least as well as raw-vector codes
    // (deterministic data + deterministic training => stable comparison)
    val cbRaw = Pq.train(emb, dim = 64, m = 32, ksub = 16, iters = 2)
    val codesRaw = Pq.encode(emb, cbRaw, dim = 64, m = 32)
    val recRawAdc = recallOf(Pq.ivfPqTopK(idx, cents, codesRaw, cbRaw, emb, q,
      dim = 64, k = 10, nprobe = 12, m = 32, rerank = 1))
    val recResAdc = recallOf(Pq.ivfPqResidualTopK(idx, cents, codesR, cbR, emb, q,
      dim = 64, k = 10, nprobe = 12, m = 32, rerank = 1))
    idx.unpersist()
    info(s"recall: residual+rerank8=$recR, ADC-only residual=$recResAdc raw=$recRawAdc")
    assert(recResAdc >= recRawAdc,
      s"residual ADC recall $recResAdc < raw ADC recall $recRawAdc")
    graft.operators.Dedup.releaseCaches(spark)
  }
}
