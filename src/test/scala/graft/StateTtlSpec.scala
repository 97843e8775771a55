package graft

import java.io.File
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wall-clock proof of the keyed-state TTL path (StatefulOps
  * .dailyFirstVisits stateTtl) — the reference's 1-day StateTtlConfig
  * (Dws02BaseLogUvDetail, StateTtlConfig.newBuilder(Time.days(1))) scaled
  * to seconds. MemoryStream + processAllAvailable hangs under
  * ProcessingTimeTimeout (ROUND_NOTES invariant), so this drives a REAL
  * file source on the real clock and polls the memory sink: after the TTL
  * elapses the key's state is evicted (the state.remove() branch), so a
  * re-arriving (user, day) re-emits — observable exactly-once-per-TTL
  * semantics. */
class StateTtlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def eventsDf(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "tss", "event_id")
      .select(col("user_id"), col("event_type"),
        col("tss").cast("timestamp").as("ts"), col("event_id"))
  }

  test("ProcessingTimeTimeout evicts state; the same (user, day) re-emits after TTL") {
    val base = "/tmp/graft_test_state_ttl"
    new scala.reflect.io.Directory(new File(base)).deleteRecursively()
    val srcDir = s"$base/src"
    val ckpt = s"$base/ckpt"
    val day = "2024-03-01"

    val batch1 = eventsDf(Seq((1L, "view", s"$day 10:00:00", 100L)))
    batch1.write.parquet(srcDir)

    import spark.implicits._
    val src = spark.readStream.schema(batch1.schema).parquet(srcDir)
    val visits = graft.streaming.StatefulOps.dailyFirstVisits(
      spark, src, stateTtl = Some("2 seconds"))
    val q = visits.toDF("user_id", "dt")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("ttl_sink")
      .start()

    def sinkRows(): Seq[(Long, String)] =
      spark.sql("SELECT user_id, dt FROM ttl_sink")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    def awaitRows(want: Seq[(Long, String)] => Boolean, what: String): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!want(sinkRows())) {
        if (System.nanoTime() > deadline) {
          q.stop()
          fail(s"timed out waiting for $what; sink=${sinkRows()}; " +
            s"status=${q.status}; lastProgress=${Option(q.lastProgress).map(_.json)}")
        }
        Thread.sleep(200)
      }
    }

    try {
      // batch 1: first visit emits once
      awaitRows(_.contains((1L, day)), "the first (1, day) emission")
      assert(sinkRows().count(_ == (1L, day)) === 1)

      // let the 2s TTL expire on the wall clock, then trigger a batch with
      // a DIFFERENT key — its micro-batch processes user 1's timeout and
      // evicts the state (the data-carrying key and the timed-out key are
      // disjoint, so eviction is not masked by the data path)
      Thread.sleep(4000)
      eventsDf(Seq((2L, "view", s"$day 11:00:00", 200L)))
        .write.mode("append").parquet(srcDir)
      awaitRows(_.contains((2L, day)), "the (2, day) marker emission")

      // user 1 re-arrives on the SAME day: with live state this is a
      // duplicate and stays silent; after eviction it re-emits
      eventsDf(Seq((1L, "view", s"$day 12:00:00", 300L)))
        .write.mode("append").parquet(srcDir)
      awaitRows(_.count(_ == (1L, day)) >= 2, "the post-eviction re-emission")
      assert(sinkRows().count(_ == (1L, day)) === 2,
        "exactly one re-emission: state was evicted once")
    } finally {
      q.stop()
      spark.catalog.dropTempView("ttl_sink")
    }
  }

  test("without TTL the same (user, day) never re-emits (control)") {
    val base = "/tmp/graft_test_state_nottl"
    new scala.reflect.io.Directory(new File(base)).deleteRecursively()
    val srcDir = s"$base/src"
    val ckpt = s"$base/ckpt"
    val day = "2024-03-01"

    val batch1 = eventsDf(Seq((1L, "view", s"$day 10:00:00", 100L)))
    batch1.write.parquet(srcDir)
    val src = spark.readStream.schema(batch1.schema).parquet(srcDir)
    val visits = graft.streaming.StatefulOps.dailyFirstVisits(spark, src, stateTtl = None)
    val q = visits.toDF("user_id", "dt")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("nottl_sink")
      .start()

    def rows(): Seq[(Long, String)] =
      spark.sql("SELECT user_id, dt FROM nottl_sink")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    try {
      q.processAllAvailable() // NoTimeout: settles normally
      assert(rows() === Seq((1L, day)))
      Thread.sleep(2500) // same wall-clock gap as the TTL test
      eventsDf(Seq((1L, "view", s"$day 12:00:00", 300L), (2L, "view", s"$day 11:00:00", 200L)))
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(rows().sorted === Seq((1L, day), (2L, day)),
        "no TTL -> no eviction -> no re-emission")
    } finally {
      q.stop()
      spark.catalog.dropTempView("nottl_sink")
    }
  }
}
