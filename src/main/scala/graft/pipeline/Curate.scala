package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Dedup, TextAnalysis}
import graft.tables.Tables

/** End-to-end training-corpus curation — the operators composed into the
  * pipeline they exist for:
  *
  *   ingest → exact dedup → MinHash near-dup removal → quality filter →
  *   language filter → token accounting → curated corpus + stats.
  *
  * Every stage is one of the oracle-checked operators; the composition is
  * all narrow transforms + the LSH candidate join, so it runs at scan
  * speed on a corpus that doesn't fit one machine.
  *
  * Usage: Curate <sfDir> <outDir> [minQuality]
  */
object Curate {

  final case class Stats(
      input: Long, exactDups: Long, nearDups: Long,
      lowQuality: Long, unknownLang: Long, kept: Long, keptTokens: Long)

  // the one cache that outlives runDocs (it backs the returned `curated`
  // frame); released by releaseCaches once the caller's terminal action ran
  private val tracked =
    scala.collection.mutable.Map.empty[SparkSession, Vector[DataFrame]]

  /** Release every cache a Curate run left on `spark` (its own surviving
    * frame + anything Dedup still tracks); call after the terminal action
    * on the returned frame. Returns how many frames were released. */
  def releaseCaches(spark: SparkSession): Int = synchronized {
    val frames = tracked.remove(spark).getOrElse(Vector.empty)
    frames.foreach(_.unpersist(blocking = false))
    frames.size + Dedup.releaseCaches(spark)
  }

  def run(spark: SparkSession, sfDir: String, minQuality: Double = 0.55,
      clusterDedup: Boolean = false): (DataFrame, Stats) =
    runDocs(spark, Tables.documents(spark, sfDir), minQuality, clusterDedup)

  /** Same pipeline over an arbitrary (doc_id, text) frame.
    *
    * @param clusterDedup near-dup policy. false (default) = pairwise
    *   drop-doc_b (every larger-id side of a pair is removed — may keep
    *   two docs that are transitively near through a third). true =
    *   connected-component clustering (Dedup.duplicateClusters): exactly
    *   ONE keeper (the min doc_id) survives per transitive near-dup
    *   cluster — the policy a production corpus dedup wants. Both are
    *   oracle-checked end-to-end (t_curate_stats /
    *   t_curate_stats_clustered). */
  def runDocs(spark: SparkSession, documents: DataFrame, minQuality: Double = 0.55,
      clusterDedup: Boolean = false): (DataFrame, Stats) = {
    val dedupMark = Dedup.trackMark(spark)
    val docs = documents.persist()
    val input = docs.count()

    // 1. exact dedup: keep the min doc_id of each fingerprint group
    val keepExact = Dedup.exactGroups(docs).select(col("keep_id").as("doc_id"))
    val afterExact = docs.join(keepExact, "doc_id")
    val exactDups = input - afterExact.count()

    // 2. near-dup removal (policy per `clusterDedup`). afterNear is
    // persisted — it feeds the quality/lang joins and five downstream
    // counts; without the cache the LSH candidate join + exact-Jaccard
    // verify (the most expensive stage) re-runs per action.
    val pairs = Dedup.minhashLshPairs(afterExact)
    val nearDupLosers =
      if (clusterDedup)
        Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster")).select(col("doc_id"))
      else pairs.select(col("doc_b").as("doc_id")).distinct()
    val afterNear = afterExact.join(nearDupLosers, Seq("doc_id"), "left_anti").persist()
    val nearDups = input - exactDups - afterNear.count()

    // 3. quality + language filters. LEFT join: zero-token docs have no
    // quality row — coalesce them to quality 0 so they land in the
    // lowQuality bucket instead of silently vanishing from the accounting
    // (input = exactDups + nearDups + lowQuality + unknownLang + kept).
    val quality = TextAnalysis.qualityScore(afterNear)
      .select(col("doc_id"), col("quality"), col("n_tokens"))
    val lang = TextAnalysis.langId(afterNear).select(col("doc_id"), col("pred_lang"))
    val scored = afterNear.join(quality, Seq("doc_id"), "left").join(lang, "doc_id")
      .withColumn("quality", coalesce(col("quality"), lit(0.0)))
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .persist()
    synchronized {
      tracked(spark) = tracked.getOrElse(spark, Vector.empty) :+ scored
    }
    val lowQuality = scored.filter(col("quality") < minQuality).count()
    val unknownLang = scored
      .filter(col("quality") >= minQuality && col("pred_lang") === "und").count()

    // scored is persisted AND materialized by the two counts above, so the
    // upstream caches — THIS run's Dedup shingle/band/candidate frames plus
    // our docs/afterNear frames — are dead weight from here: release them
    // scoped (releaseSince), so a concurrent Dedup caller on the same
    // session keeps its own caches. The returned `curated` reads only from
    // scored.
    Dedup.releaseSince(spark, dedupMark)
    docs.unpersist(blocking = false)
    afterNear.unpersist(blocking = false)

    val curated = scored
      .filter(col("quality") >= minQuality && col("pred_lang") =!= "und")
      .select(col("doc_id"), col("text"), col("pred_lang"), col("quality"), col("n_tokens"))
    val kept = curated.count()
    // coalesce: SUM over an empty kept set is NULL (an over-aggressive
    // filter emptying the corpus must yield kept_tokens = 0, not a crash)
    val keptTokens = curated
      .agg(coalesce(sum(col("n_tokens")), lit(0L))).collect()(0).getLong(0)
    val stats = Stats(input, exactDups, nearDups, lowQuality, unknownLang, kept, keptTokens)
    assert(stats.input == stats.exactDups + stats.nearDups + stats.lowQuality
      + stats.unknownLang + stats.kept,
      s"curation accounting does not balance: $stats")
    (curated, stats)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val minQuality = if (args.length > 2) args(2).toDouble else 0.55
    val spark = GraftSession.local("graft-curate")
    val (curated, s) = run(spark, sfDir, minQuality)
    curated.write.mode("overwrite").parquet(outDir)
    releaseCaches(spark)
    println(s"""{"input":${s.input},"exact_dups":${s.exactDups},"near_dups":${s.nearDups},""" +
      s""""low_quality":${s.lowQuality},"unknown_lang":${s.unknownLang},""" +
      s""""kept":${s.kept},"kept_tokens":${s.keptTokens}}""")
    spark.stop()
  }
}
