package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.tables.Tables

/** Scale sweep for the two-pass distributed prefix-sum paths (not part of
  * the catalog): `Sampling.packSequencesScalable` and
  * `Sampling.shuffleRank` carry the no-frozen-layout design (pure-function
  * bucket boundaries, two passes over one persisted input) but SCALE.md
  * had no measured point past sf1 for them. Prints wall time AND the
  * run's shuffle read/write bytes (stage-completion listener deltas) per
  * SF dir, so the table records whether the shuffle mass — the thing that
  * would dominate at 100 TB — grows linearly with input and nothing else.
  *
  * Usage: PackShuffleSweep <sfDir>... (e.g. sf0.1 /tmp/graft_sf1 /tmp/graft_sf3)
  */
object PackShuffleSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("pack-shuffle-sweep")
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
      // listener events drain asynchronously; settle before reading deltas
      Thread.sleep(300)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label wall=$dt%.2f shuffle_write_mb=${(shufWrite.get - w0) / 1e6}%.1f shuffle_read_mb=${(shufRead.get - r0) / 1e6}%.1f")
    }
    for (dir <- args) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val events = Tables.events(spark, dir)
      println(s"== $dir docs=${docs.count()} events=${events.count()}")
      // one untimed warmup per operator (parquet footers + codegen)
      noop(Sampling.packSequencesScalable(docs, budget = 4096))
      graft.pipeline.Curate.releaseCaches(spark)
      noop(Sampling.shuffleRank(events, col("event_id")))
      graft.pipeline.Curate.releaseCaches(spark)
      for (run <- 1 to 3) {
        timed(s"$dir packSequencesScalable(budget=4096) run$run") {
          noop(Sampling.packSequencesScalable(docs, budget = 4096))
        }
        timed(s"$dir shuffleRank(events,event_id) run$run") {
          noop(Sampling.shuffleRank(events, col("event_id")))
        }
        timed(s"$dir shuffleRank(docs,doc_id) run$run") {
          noop(Sampling.shuffleRank(docs, col("doc_id")))
        }
      }
    }
    spark.stop()
  }
}
