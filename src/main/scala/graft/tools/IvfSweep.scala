package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Similarity}
import graft.tables.Tables

/** Parameter-sweep harness for the IVF recall gate (not part of the
  * catalog): prints recall + wall time per (iters, rounds, nprobe, widen)
  * so the t_ann_ivf_recall bound is set from measurement, not hope. */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("ivf-sweep")
    for (dir <- args) {
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(emb, q, 10)
        .select(col("qid"), col("vec_id")).persist()
      val nExp = exact.count()
      for {
        iters <- Seq(1, 2)
        rounds <- Seq(2, 3)
        nprobe <- Seq(10, 12)
      } {
        val t0 = System.nanoTime()
        val cents = Ivf.trainScalable(emb, 16, iters = iters, rounds = rounds)
        val idx = Ivf.index(emb, cents)
        val ivf = Ivf.topK(idx, cents, q, 10, nprobe = nprobe)
          .select(col("qid"), col("vec_id")).withColumn("hit", lit(1))
        val nHit = exact.join(ivf, Seq("qid", "vec_id"), "left")
          .agg(sum(coalesce(col("hit"), lit(0)))).collect()(0).getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$dir iters=$iters rounds=$rounds nprobe=$nprobe recall=${nHit.toDouble / nExp}%.3f time=$dt%.2f")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
