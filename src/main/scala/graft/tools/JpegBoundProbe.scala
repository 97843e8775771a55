package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Video
import graft.tables.Tables

/** Measures the ACTUAL per-frame |decoded mean − formula mean| of the
  * MJPEG arm across the fixture (round-14 verdict item: can the
  * t_video_frames self-validating bound tighten below 8?). Prints
  * max / avg / p99 of the deviation per SF dir — numbers go to
  * SCALE.md; the catalog gate stays whatever the measured max plus a
  * safety margin justifies. */
object JpegBoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("jpeg-bound-probe")
    import spark.implicits._
    for (dir <- args) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"))
      val frames = Video.frameTable(spark, Video.synthesize(spark, docs))
      val expected = docs.as[Long].flatMap { id =>
        val n = Video.synthParams(id)._3
        (0 until n).iterator.map(f => (id, f, Video.synthFrameSum(id, f)))
      }.toDF("doc_id", "frame_idx", "expected_sum")
      val d = frames.join(expected, Seq("doc_id", "frame_idx"))
        .select((abs(col("sum_lum") - col("expected_sum")).cast("double") /
          col("n_px")).as("dev"))
      val row = d.agg(max(col("dev")).as("mx"), avg(col("dev")).as("av"),
        expr("percentile(dev, 0.99)").as("p99")).collect()(0)
      println(f"$dir max=${row.getDouble(0)}%.4f avg=${row.getDouble(1)}%.4f " +
        f"p99=${row.getDouble(2)}%.4f")
    }
    spark.stop()
  }
}
