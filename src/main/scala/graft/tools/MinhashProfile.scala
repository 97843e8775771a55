package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.tables.Tables

/** One-off stage profile for minhashLshPairs at an SF dir: band-bucket
  * size histogram (pair mass = the verify stage's workload), per-stage
  * wall times, and the full pipeline. Round-7 findings at sf1 (50k docs):
  * no bucket exceeded the 1000 cap (max 387), so skew was NOT the cost —
  * the 1.47M-candidate verify stage was (boxed array_intersect hash
  * sets), fixed by the fused sorted-merge jaccard + the long band-key
  * join (6.1s → 4.3s cold). */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("minhash-profile",
      Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, dir)
    val sh = timed("shingles")(Dedup.shingleSets(docs).persist())
    println(s"docs with shingles: ${sh.count()}")
    val bands = timed("bands") {
      val b = Dedup.bandsFromShingles(sh).persist(); b.count(); b
    }
    val hist = timed("bucket-hist") {
      bands.groupBy(col("b"), col("band_key")).agg(count(lit(1)).as("bs"))
        .groupBy(col("bs")).agg(count(lit(1)).as("n_buckets"),
          (col("bs") * col("bs") * count(lit(1)) / 2).as("pair_mass"))
        .orderBy(col("bs").desc).limit(30).collect()
    }
    println("bs -> n_buckets (pair_mass):")
    hist.foreach(r => println(s"  ${r.get(0)} -> ${r.get(1)} (${r.get(2)})"))
    val totalPairMass = bands.groupBy(col("b"), col("band_key"))
      .agg(count(lit(1)).as("bs"))
      .agg(sum(col("bs") * (col("bs") - 1) / 2)).first()
    println(s"total candidate pair mass: $totalPairMass")
    val t = timed("full minhashLshPairs") {
      Dedup.minhashLshPairs(docs).count()
    }
    println(s"pairs: $t")
    spark.stop()
  }
}
