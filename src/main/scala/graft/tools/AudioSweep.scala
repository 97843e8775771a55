package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Audio
import graft.tables.Tables

/** Scale sweep for the round-13 audio arm (not part of the catalog):
  * the full decode pass (synthesize mixed-container WAV/AU/AIFF →
  * javax.sound decode → stats + block-energy fingerprint), the
  * header-only metadata pass, and the banded near-dup joins at each SF
  * dir — wall + per-run shuffle bytes via [[SweepHarness]]. Decode is
  * pure map-side (zero expected shuffle); pair output is quadratic in
  * duplicate-group size (the fixture's same-group clips all sit within
  * hamming 2), which is exactly why nearDupKeepers is the scale path.
  *
  * Usage: AudioSweep <sfDir>...
  */
object AudioSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("audio-sweep")
    val h = new SweepHarness(spark)
    for (dir <- args) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"))
      println(s"== $dir docs=${docs.count()}")
      def stats() = Audio.audioStats(spark, Audio.synthesize(spark, docs))
      // untimed warmups
      h.noop(stats())
      val warmPairs = Audio.nearDupPairs(
        stats().select(col("doc_id"), col("afp")))
      println(s"   pairs(hamming<=3)=${warmPairs.count()}")
      for (run <- 1 to 3) {
        h.timed(s"$dir decode+stats+afp run$run") { h.noop(stats()) }
        h.timed(s"$dir header-meta run$run") {
          h.noop(Audio.audioMeta(spark, Audio.synthesize(spark, docs)))
        }
        h.timed(s"$dir nearDupPairs run$run") {
          h.noop(Audio.nearDupPairs(stats().select(col("doc_id"), col("afp"))))
        }
        h.timed(s"$dir nearDupKeepers run$run") {
          h.noop(Audio.nearDupKeepers(stats().select(col("doc_id"), col("afp"))))
        }
      }
    }
    spark.stop()
  }
}
