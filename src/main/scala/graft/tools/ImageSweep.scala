package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Images
import graft.tables.Tables

/** Scale sweep for the image arm (not part of the catalog): the full
  * decode pass (synthesize mixed-format PNG/BMP/GIF/TIFF → ImageIO
  * decode → stats + aHash), the header-only metadata pass, and the
  * banded near-dup pair join at each SF dir — wall + per-run shuffle
  * bytes via [[SweepHarness]] (deterministic listener drain). The
  * decode pass is pure map-side (zero expected shuffle); the pair
  * join's shuffle mass tracks candidates, and its OUTPUT is inherently
  * quadratic in duplicate-group size (the fixture's groups grow
  * linearly with SF, so pair counts grow ~SF² — that is the true
  * answer's size, not an engine term; a production corpus groups
  * exact-hash duplicates first).
  *
  * Usage: ImageSweep <sfDir>...
  */
object ImageSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("image-sweep")
    val h = new SweepHarness(spark)
    for (dir <- args) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"))
      println(s"== $dir docs=${docs.count()}")
      def stats() = Images.imageStats(spark, Images.synthesize(spark, docs))
      // untimed warmups
      h.noop(stats())
      val warmPairs = Images.nearDupPairs(
        stats().select(col("doc_id"), col("ahash")))
      println(s"   pairs(hamming<=3)=${warmPairs.count()}")
      for (run <- 1 to 3) {
        h.timed(s"$dir decode+stats+ahash run$run") { h.noop(stats()) }
        h.timed(s"$dir header-meta run$run") {
          h.noop(Images.imageMeta(spark, Images.synthesize(spark, docs)))
        }
        h.timed(s"$dir nearDupPairs run$run") {
          h.noop(Images.nearDupPairs(stats().select(col("doc_id"), col("ahash"))))
        }
        h.timed(s"$dir nearDupKeepers run$run") {
          h.noop(Images.nearDupKeepers(stats().select(col("doc_id"), col("ahash"))))
        }
      }
    }
    spark.stop()
  }
}
