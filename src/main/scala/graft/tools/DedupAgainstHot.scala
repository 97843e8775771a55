package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.tables.Tables

/** Hot-reference stress for [[Dedup.dedupAgainst]] (round-9 scale item):
  * under a 100 TB curated reference, a boilerplate band is the skew risk
  * the `maxBucket` cap guards — this tool injects a deliberately hot
  * reference block (N near-identical boilerplate docs, all landing in
  * the SAME band buckets) into the sf1/sf3 fixture and measures the
  * capped labeling wall-clock vs (a) the same corpus with no hot block
  * and (b) the uncapped join on a bounded slice (to show the blow-up the
  * cap prevents). The cap holds: capped-with-hot must track no-hot,
  * because the hot buckets are excluded from banding entirely and their
  * members still match through their other, more selective bands.
  *
  * Usage: run_main.sh graft.tools.DedupAgainstHot [sfDir] [hotN]
  */
object DedupAgainstHot {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("dedup-against-hot",
      Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    import spark.implicits._
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val hotN = if (args.length > 1) args(1).toInt else 20000
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    // the hot block: hotN docs sharing one boilerplate body with THREE
    // rotating suffixes (id % 3) — only 3 distinct texts, deliberately:
    // identical shingle sets make every band signature identical, so the
    // block's hotN rows land in at most 3 buckets per band (maximally
    // hot by construction; distinct per-id suffixes would scatter the
    // min-hashes across many buckets and dilute the skew under test).
    // Fingerprints are NOT distinct; that is irrelevant here because
    // prepareReference bands per doc_id without exact-collapsing the
    // reference — if a future refactor dedups reference text before
    // banding, this block shrinks to 3 members and the SCALE.md round-9
    // numbers must be re-measured
    val boiler = "terms of service apply contact support for help " +
      "all rights reserved unsubscribe from this newsletter below"
    val hot = spark.range(hotN)
      .select((col("id") + 100000000L).as("doc_id"),
        concat(lit(boiler), lit(" tail"), (col("id") % 3).cast("string"))
          .as("text"))
    val reference = docs.unionByName(hot)
    // docs side: the fixture corpus plus 2000 docs that are NEAR-dups of
    // the hot block (one trailing token differs -> shingle Jaccard ~0.88,
    // above the 0.8 verify threshold) — the onboarding feed a
    // template-heavy source produces
    val feed = docs.limit(0).unionByName(
      spark.range(2000).select((col("id") + 200000000L).as("doc_id"),
        concat(lit(boiler), lit(" c"), (col("id") % 7).cast("string"))
          .as("text")))
      .unionByName(docs.sample(withReplacement = false, 0.02, seed = 7))
    feed.persist(); val nFeed = feed.count()
    println(s"reference: $nDocs fixture + $hotN hot; feed: $nFeed")

    // JVM/codegen warm-up: one full untimed pass so run order does not
    // charge warm-up to the first timed variant
    locally {
      Dedup.dedupAgainst(feed, docs).groupBy(col("drop_reason")).count().collect()
      Dedup.releaseCaches(spark)
    }

    // (a) baseline: no hot block in the reference
    val base = timed("labeled-no-hot") {
      val r = Dedup.dedupAgainst(feed, docs)
      val c = r.groupBy(col("drop_reason")).count().collect()
      Dedup.releaseCaches(spark); c
    }
    println(s"  no-hot: ${base.mkString(", ")}")

    // (b) capped (default maxBucket=1000) with the hot reference
    val capped = timed("labeled-hot-capped") {
      val r = Dedup.dedupAgainst(feed, reference)
      val c = r.groupBy(col("drop_reason")).count().collect()
      Dedup.releaseCaches(spark); c
    }
    println(s"  hot-capped: ${capped.mkString(", ")}")

    // (c) uncapped control on the SAME corpus: maxBucket above hotN —
    // every feed boilerplate doc fans into ~hotN verify pairs
    val uncapped = timed("labeled-hot-UNCAPPED") {
      val r = Dedup.dedupAgainst(feed, reference, maxBucket = hotN * 2)
      val c = r.groupBy(col("drop_reason")).count().collect()
      Dedup.releaseCaches(spark); c
    }
    println(s"  hot-uncapped: ${uncapped.mkString(", ")}")
    spark.stop()
  }
}
