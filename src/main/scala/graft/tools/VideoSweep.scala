package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Video
import graft.tables.Tables

/** Scale sweep for the round-13 video arm (not part of the catalog):
  * container synthesis (real JPEG encodes + RIFF assembly), the
  * header-only metadata walk, full per-frame decode, and stride-2
  * sampling at each SF dir — wall + per-run shuffle bytes via
  * [[SweepHarness]]. Everything is map-side (zero expected shuffle);
  * the sampling pass should cost roughly half the full-decode pass,
  * which is the decode-only-sampled property made measurable.
  *
  * Usage: VideoSweep <sfDir>...
  */
object VideoSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("video-sweep")
    val h = new SweepHarness(spark)
    for (dir <- args) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"))
      println(s"== $dir docs=${docs.count()}")
      def vids() = Video.synthesize(spark, docs)
      h.noop(vids()) // untimed warmup
      println(s"   frames=${Video.frameTable(spark, vids()).count()}")
      for (run <- 1 to 3) {
        h.timed(s"$dir synth(jpeg-encode+riff) run$run") { h.noop(vids()) }
        h.timed(s"$dir header-meta run$run") {
          h.noop(Video.videoMeta(spark, vids()))
        }
        h.timed(s"$dir frameTable(full decode) run$run") {
          h.noop(Video.frameTable(spark, vids()))
        }
        h.timed(s"$dir sampleFrames(stride=2) run$run") {
          h.noop(Video.sampleFrames(spark, vids(), stride = 2))
        }
      }
      // --- round-14 passes ---
      // decode-only-survivors: gatedProfile decodes ONE keyframe for
      // gate survivors only vs keyframeHashes decoding one per video —
      // the delta is the metadata-gate saving a curation pass banks
      def rawVids() = Video.synthesizeRaw(spark, docs)
      def scenes() = Video.synthesizeScenes(spark, docs)
      def avVids() = Video.synthesizeAV(spark, docs)
      h.noop(rawVids()); h.noop(scenes()); h.noop(avVids()) // warmups
      for (run <- 1 to 3) {
        h.timed(s"$dir keyframeHashes(all docs) run$run") {
          h.noop(Video.keyframeHashes(spark, vids()))
        }
        h.timed(s"$dir gatedProfile(survivor-only keyframes) run$run") {
          h.noop(Video.gatedProfile(spark, vids(),
            minPixels = 512, minFrames = 3, minFps = 12, maxFps = 60))
        }
        h.timed(s"$dir synthRaw(dib) run$run") { h.noop(rawVids()) }
        h.timed(s"$dir frameTableRaw(byte decode) run$run") {
          h.noop(Video.frameTable(spark, rawVids()))
        }
        h.timed(s"$dir sceneCuts run$run") {
          h.noop(Video.sceneCuts(spark, scenes()))
        }
        h.timed(s"$dir synthAV(mux) run$run") { h.noop(avVids()) }
        h.timed(s"$dir demuxAudio run$run") {
          h.noop(Video.extractAudioTrack(spark, avVids()))
        }
      }
    }
    spark.stop()
  }
}
