package graft.tools

import graft.operators.Similarity
import graft.tables.Tables

/** One-off pair-identity check for the sharp-banded LSH entry: compares
  * cosineNearDupPairsBucketed against the exact O(N²) form at the chosen
  * operating point across SF dirs. */
object LshCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("lsh-check")
    val (thr, rpb, nb) = (args(0).toDouble, args(1).toInt, args(2).toInt)
    for (dir <- args.drop(3)) {
      val emb = Tables.embeddings(spark, dir)
      val exact = Similarity.cosineNearDupPairs(emb, thr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bucketed = Similarity.cosineNearDupPairsBucketed(emb, thr, 64, rpb, nb)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"$dir thr=$thr r=$rpb b=$nb exact=${exact.size} bucketed=${bucketed.size} " +
        s"missed=${(exact -- bucketed).size} spurious=${(bucketed -- exact).size}")
    }
    spark.stop()
  }
}
