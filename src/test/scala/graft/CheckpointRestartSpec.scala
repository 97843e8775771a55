package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.Tables

/** §2.9 delivery semantics: a checkpointed streaming query stopped and
  * restarted over new input must produce exactly-once output (the parquet
  * sink's metadata log + checkpoint replaces the reference's commented-out
  * Flink checkpointing, BaseLogApp.java:30-42).
  */
class CheckpointRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stop/restart with checkpoint yields exactly-once windowed output") {
    val base = "/tmp/graft_test_ckpt"
    new scala.reflect.io.Directory(new File(base)).deleteRecursively()
    val srcDir = s"$base/src"
    val outDir = s"$base/out"
    val ckpt = s"$base/ckpt"

    // two input files = two deliveries of disjoint halves
    val ev = Tables.events(spark, SparkTestSession.sf0001)
      .select(col("user_id"), col("ts"), col("value"), col("event_type"), col("event_id"))
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 === 1)
    half1.write.parquet(srcDir)

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ct"))

    def runOnce(): Unit = {
      val src = spark.readStream.schema(ev.schema).parquet(srcDir)
      val q = src.select(col("event_type"), col("event_id"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .start()
      q.awaitTermination()
    }

    runOnce() // processes half1, commits, stops
    half2.write.mode("append").parquet(srcDir)
    runOnce() // restart from checkpoint: must process ONLY half2

    val got = agg(spark.read.parquet(outDir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = agg(ev).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want) // no loss, no duplication
  }
}
