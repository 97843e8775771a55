package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Images
import graft.tables.Tables

/** Scale sweep for the round-12 image arm (not part of the catalog):
  * the full decode pass (synthesize PNG → ImageIO decode → stats +
  * aHash), the header-only metadata pass, and the banded near-dup pair
  * join at each SF dir — wall + per-run shuffle bytes (the
  * PackShuffleSweep harness). The decode pass is pure map-side (zero
  * expected shuffle); the pair join's shuffle mass tracks candidates,
  * and its OUTPUT is inherently quadratic in duplicate-group size (the
  * fixture's groups grow linearly with SF, so pair counts grow ~SF² —
  * that is the true answer's size, not an engine term; a production
  * corpus groups exact-hash duplicates first).
  *
  * Usage: ImageSweep <sfDir>...
  */
object ImageSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("image-sweep")
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      graft.pipeline.Curate.releaseCaches(spark)
      System.gc(); Thread.sleep(200)
      val (w0, r0) = (shufWrite.get, shufRead.get)
      val t0 = System.nanoTime()
      f
      Thread.sleep(300) // listener events drain asynchronously
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label wall=$dt%.2f shuffle_write_mb=${(shufWrite.get - w0) / 1e6}%.1f shuffle_read_mb=${(shufRead.get - r0) / 1e6}%.1f")
    }
    for (dir <- args) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"))
      println(s"== $dir docs=${docs.count()}")
      def stats() = Images.imageStats(spark, Images.synthesize(spark, docs))
      // untimed warmups
      noop(stats())
      val warmPairs = Images.nearDupPairs(
        stats().select(col("doc_id"), col("ahash")))
      println(s"   pairs(hamming<=3)=${warmPairs.count()}")
      for (run <- 1 to 3) {
        timed(s"$dir decode+stats+ahash run$run") { noop(stats()) }
        timed(s"$dir header-meta run$run") {
          noop(Images.imageMeta(spark, Images.synthesize(spark, docs)))
        }
        timed(s"$dir nearDupPairs run$run") {
          noop(Images.nearDupPairs(stats().select(col("doc_id"), col("ahash"))))
        }
        timed(s"$dir nearDupKeepers run$run") {
          noop(Images.nearDupKeepers(stats().select(col("doc_id"), col("ahash"))))
        }
      }
    }
    spark.stop()
  }
}
