package graft.streaming

import graft.GraftSession
import graft.operators.ConfigRouter
import graft.tables.Tables

/** Streaming smoke entry: file-source events -> config-routed dynamic sink
  * (the DimApp/BaseDBApp topology under Structured Streaming).
  * Usage: StreamSmoke <sfDir> <outDir>
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("graft-stream-smoke")
    // streaming file source must see the RAW parquet schema (ts = ns long);
    // normalization to TimestampType happens after
    val rawSchema = Tables.load(spark, sfDir, "events").schema
    val src = Tables.normalizeEvents(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir))
    val routed = ConfigRouter.route(spark, src)
    val q = StreamingPipelines.routedSink(routed, outDir).start()
    q.awaitTermination()
    spark.read.parquet(outDir)
      .groupBy("sink_table").count().orderBy("sink_table")
      .show(20, false)
    spark.stop()
  }
}
