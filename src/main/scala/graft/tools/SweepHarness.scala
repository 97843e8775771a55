package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared measurement harness for the tools/ scale sweeps: per-run wall
  * + shuffle bytes via a stage-completed listener, with a DETERMINISTIC
  * listener drain between runs (`LiveListenerBus.waitUntilEmpty` via
  * reflection — the method is `private[spark]`, public at the bytecode
  * level) instead of a fixed sleep, so late stage events cannot be
  * credited to the wrong run on a loaded machine (ADVICE r12). */
final class SweepHarness(spark: SparkSession) {
  private val shufWrite = new AtomicLong
  private val shufRead = new AtomicLong

  spark.sparkContext.addSparkListener(new SparkListener {
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      val m = ev.stageInfo.taskMetrics
      if (m != null) {
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
  })

  /** Block until every queued listener event is delivered. */
  private def drain(): Unit = {
    val sc = spark.sparkContext
    val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
    bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    ()
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def timed(label: String)(f: => Unit): Unit = {
    graft.pipeline.Curate.releaseCaches(spark)
    System.gc()
    drain() // stray events from warmup/previous run land before the baseline
    val (w0, r0) = (shufWrite.get, shufRead.get)
    val t0 = System.nanoTime()
    f
    drain() // this run's events land before the delta is read
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"$label wall=$dt%.2f shuffle_write_mb=${(shufWrite.get - w0) / 1e6}%.1f " +
      f"shuffle_read_mb=${(shufRead.get - r0) / 1e6}%.1f")
  }
}
