package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.tables.Tables

/** Scale sweep for the round-11 character-offset span family (not part
  * of the catalog): `decontaminateSpans(cjk = true)` and
  * `dedupSpans(cjk = true)` at each SF dir, wall + per-run shuffle
  * bytes (the PackShuffleSweep harness). The question: does the offset
  * pipeline — fused span kernel, gram/chunk-keyed count shuffle,
  * doc-keyed range collect, per-doc excision fold — scale like its
  * latin token-rebuild siblings (whose curves SCALE.md already has), or
  * did the spans/extents add a data-sized term?
  *
  * Usage: SpanCjkSweep <sfDir>...
  */
object SpanCjkSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("span-cjk-sweep")
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
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 23 === 0)
      println(s"== $dir docs=${docs.count()}")
      // untimed warmups
      noop(TextAnalysis.decontaminateSpans(docs, bench, n = 4, cjk = true))
      graft.pipeline.Curate.releaseCaches(spark)
      noop(Dedup.dedupSpans(docs, k = 8, maxOcc = 1, cjk = true))
      graft.pipeline.Curate.releaseCaches(spark)
      for (run <- 1 to 3) {
        timed(s"$dir decontaminateSpans(cjk,n=4) run$run") {
          noop(TextAnalysis.decontaminateSpans(docs, bench, n = 4, cjk = true))
        }
        timed(s"$dir decontaminateSpans(latin,n=4) run$run") {
          noop(TextAnalysis.decontaminateSpans(docs, bench, n = 4))
        }
        timed(s"$dir dedupSpans(cjk,k=8) run$run") {
          noop(Dedup.dedupSpans(docs, k = 8, maxOcc = 1, cjk = true))
        }
        timed(s"$dir dedupSpans(latin,k=8) run$run") {
          noop(Dedup.dedupSpans(docs, k = 8, maxOcc = 1))
        }
      }
    }
    spark.stop()
  }
}
