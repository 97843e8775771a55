package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Continuous curation: pipeline.Curate's full gate chain
  * (exact dedup → MinHash near-dup removal → optional decontamination +
  * repetition + classifier gates → quality → language) as ONE
  * incremental sink. Every
  * micro-batch document is labeled with the first gate that drops it (or
  * 'kept') — the same precedence and drop rules as Curate.runLabeled — and
  * the labeled rows land in `outPath/batch=<id>`, so the streaming
  * accounting is the union of batch accountings.
  *
  * Cross-batch state is the same registry design as the other incremental
  * sinks (all under `registryPath`, every table in overwrite-idempotent
  * `batch=<id>` dirs, reads gated on _SUCCESS and excluding the current
  * id, folded into bounded snapshots every `compactEvery` batches —
  * Registry scaladoc has the protocol):
  *  - `fps/`     — EVERY seen document's normalized-text fingerprint
  *    (dropped docs too: the batch keeper of a fingerprint group is its
  *    FIRST occurrence, and later re-occurrences are exact dups even when
  *    that keeper later failed a quality gate — exactly exactGroups'
  *    min-doc_id rule on an id-ordered feed);
  *  - `bands/` + `hashes/` — LSH bands and shingle-hash arrays of EXACT
  *    SURVIVORS only (the batch pipeline runs LSH on afterExact), dropped
  *    near-dups included so later near-dups of a dropped doc still drop.
  *
  * Stream ≡ batch (StreamingSpec): on an id-ordered feed the union of
  * batch labels equals Curate.runDocs' accounting over the corpus-so-far
  * — same kept set, same per-reason counts, same kept-token sum — under
  * the sub-cap bucket regime the other LSH sinks document. The
  * decontamination gate uses the exact n-gram join against the STATIC
  * benchmark (per-doc and batching-independent, like every other gate);
  * swap in `decontaminationSink`'s broadcast-Bloom scoring when the
  * corpus-side shuffle matters more than exactness.
  *
  * At scale, per batch: one fingerprint agg, one (b, band_key)-keyed
  * registry join, one gram-keyed contamination join vs a tiny benchmark,
  * and map-side quality/lang/repetition — each the scale shape its batch
  * twin already audited. Registry state grows with seen docs, not pairs.
  */
object CurateStream {

  /** @param stripHtml when true, every micro-batch is HTML-stripped
    *   FIRST (before the PII scrub — the batch chain's order). Per-doc
    *   map-side regex, batching-independent; registries then hold
    *   fingerprints/bands of the EXTRACTED text.
    * @param gopher Gopher rule-set gate (docs failing any rule drop as
    *   `gopher_rules`, after repetition, before the classifier — the
    *   batch precedence). Per-doc map-side rules over static thresholds,
    *   so the gate is batching-independent like quality/lang.
    * @param classifier when set, the model gate runs per batch exactly as
    *   in the batch chain (Curate.ClassifierGate): the weight table is a
    *   STATIC broadcast side — train it once before starting the stream —
    *   and scoring is per-doc, so the gate is batching-independent like
    *   quality/lang and stream≡batch holds with the SAME weights on both
    *   sides.
    * @param lm bigram-LM fluency gate (docs below minMicroAvg drop as
    *   `lm_fluency`) — the model is STATIC tables (TextAnalysis.trainLm,
    *   run before starting the stream) and scoring is per-doc, so the
    *   gate is batching-independent and stream≡batch holds with the SAME
    *   model on both sides.
    * @param redactPii when true, every micro-batch is PII-scrubbed
    *   (TextAnalysis.redactPii) before any gate or registry write — the
    *   batch chain's pre-transform. Per-doc and deterministic, so the
    *   scrub is batching-independent and stream≡batch holds verbatim;
    *   registries then hold fingerprints/bands OF THE SCRUBBED text,
    *   which is the point (two docs differing only in leaked PII are
    *   duplicates after the scrub).
    * @param excise when set, SURGICAL decontamination runs as the last
    *   pre-transform (Curate.runDocs' excise: shingles shared with this
    *   STATIC benchmark are excised from the text; character-offset
    *   excision in BOTH modes — structure-preserving, the runDocs
    *   posture) — per-doc against fixed grams, so
    *   batching-independent, and registries hold fingerprints/bands of
    *   the EXCISED text: docs differing only around leaked eval spans
    *   dedup together after excision, across batches too.
    * @param cjk mixed-script mode (Curate.runDocs' cjk): binds `toks`
    *   once on the persisted batch frame via the fused
    *   `tokenize_array_cjk` kernel, so shingles/quality/language/
    *   decontamination/LM scoring all read CJK character bigrams via the
    *   bound-toks reuse contract; the quality stop-rate gains the
    *   zhLexicon bigram arm, the `benchmark` is tokenized in the same
    *   mode, and the model gates are mode-checked in both directions
    *   (Curate.requireGateModes — train `lm`/`classifier` models on
    *   TokMode.bind-bound frames matching this flag; `gopher` is
    *   latin-only and refused under cjk). Per-doc and deterministic, so the
    *   mode is batching-independent; registries then hold CJK-bigram
    *   shingle hashes, matching the batch chain with the same flag. */
  def sink(docs: DataFrame, registryPath: String, outPath: String,
      benchmark: Option[DataFrame] = None, minQuality: Double = 0.55,
      contaminationN: Int = 4, maxDup3Frac: Double = 1.0,
      gopher: Option[graft.pipeline.Curate.GopherGate] = None,
      classifier: Option[graft.pipeline.Curate.ClassifierGate] = None,
      lm: Option[graft.pipeline.Curate.LmGate] = None,
      stripHtml: Boolean = false,
      redactPii: Boolean = false,
      excise: Option[DataFrame] = None,
      exciseN: Int = 4,
      cjk: Boolean = false,
      numSigs: Int = 8, rowsPerBand: Int = 2, threshold: Double = 0.8,
      maxBucket: Int = 1000, compactEvery: Int = 16): DataStreamWriter[Row] = {
    // same loud refusals as Curate.runDocs (one shared contract): LM and
    // classifier models must match the pipeline's tokenization mode in
    // BOTH directions, and the latin-only gopher gate is refused under cjk
    graft.pipeline.Curate.requireGateModes(cjk, gopher, classifier, lm)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // refuse a registry whose hash arrays predate the sorted-array
        // contract (fused verify would silently mis-score)
        Registry.ensureFormat(spark, registryPath, "hashes-sorted-v2")
        // bound BOTH read surfaces before this batch's reads: the
        // three-table registry folds jointly (a snapshot only holds ids
        // committed in fps AND bands AND hashes), and the labeled output
        // folds as its own single-table group so keptView/labeledView stay
        // O(snapshot + compactEvery dirs) under continuous ingestion
        Registry.maybeCompact(spark, registryPath,
          Seq(s"$registryPath/fps", s"$registryPath/bands", s"$registryPath/hashes"),
          upToExclusive = batchId, every = compactEvery)
        Registry.maybeCompact(spark, outPath, Seq(outPath),
          upToExclusive = batchId, every = compactEvery)
        val dedupMark = Dedup.trackMark(spark)
        // every frame persisted in this batch body lands here and is
        // released in the one finally — a failed batch must not leak
        // InMemoryRelations under the at-least-once retry contract
        val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        def keep(df: DataFrame): DataFrame = { persisted += df.persist(); df }
        val extracted =
          if (stripHtml) TextAnalysis.stripHtml(batch.toDF())
            .select(col("doc_id"), col("text"))
          else batch.toDF()
        val scrubbed =
          if (redactPii) TextAnalysis.redactPii(extracted)
            .select(col("doc_id"), col("redacted").as("text"))
          else extracted
        // bind the mode's tokenization before the persist — through the
        // FUSED kernel (one codegen'd scan per batch, null text → empty
        // array). Latin batches bind too (Curate.runDocs' round-10
        // binding is identical): every gate reuses the one bound column
        // instead of re-tokenizing the cached batch per consumer.
        // surgical decontamination LAST among the pre-transforms
        // (Curate.runDocs' order) — per-doc against the STATIC `excise`
        // benchmark (REBOUND in the pipeline's mode, the runDocs
        // posture — a stray caller binding must not leak through), so
        // the transform is batching-independent like the scrub; its
        // registry-tracked persists release in the finally
        val preToks = excise match {
          case Some(bx) => TextAnalysis
            .decontaminateSpans(scrubbed,
              graft.functions.TokMode.bind(bx, cjk), exciseN, cjk,
              preserveStructure = true)
            .select(col("doc_id"), col("text"))
          case None => scrubbed
        }
        val b = keep(graft.functions.TokMode.bind(preToks, cjk))
        // NULL-text sentinel: fingerprint(NULL) is NULL, and the registry
        // equi-join below is null-UNSAFE — without the sentinel a null-text
        // doc in a later batch never matches a null-fp doc in the registry,
        // while batch exactGroups DOES group NULL fingerprints into one
        // group (stream≡batch would break for null-text docs split across
        // batches). "null:" cannot collide with a 32-hex md5.
        val fps = keep(b.select(col("doc_id"),
          coalesce(graft.functions.TextFunctions.fingerprint(col("text")),
            lit("null:")).as("fp")))
        try {
          // 1. exact dups: fingerprint seen in the registry, or a
          // non-first occurrence within this batch (min doc_id keeps)
          val vFps = Registry.view(spark, registryPath, s"$registryPath/fps", batchId)
          val dupCross =
            if (vFps.isEmpty) b.select(col("doc_id")).limit(0)
            else fps.join(
              spark.read.parquet(vFps.paths: _*)
                .select(col("fp")).distinct(), "fp")
              .select(col("doc_id"))
          val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
          val dupIn = fps.withColumn("__rn", row_number().over(wFp))
            .filter(col("__rn") > 1).select(col("doc_id"))
          val exactDropped = dupCross.union(dupIn).distinct()
            .localCheckpoint(true)
          val se = keep(b.join(exactDropped, Seq("doc_id"), "left_anti"))

          // 2. near-dups among exact survivors: in-batch pairs + registry
          // verify, the minhashDedupSink shape over one shingle scan
          val sh = keep(Dedup.shingleSets(se))
          val bands = keep(Dedup.bandsFromShingles(sh, numSigs, rowsPerBand))
          locally {
            val inBatch = Dedup.minhashPairsFromTables(sh, bands, threshold, maxBucket)
              .select(col("doc_b").as("doc_id")).distinct()
            val vBands = Registry.view(spark, registryPath, s"$registryPath/bands", batchId)
            val vHashes = Registry.view(spark, registryPath, s"$registryPath/hashes", batchId)
            // dirs above the watermark keep the both-tables-committed
            // intersection; snapshots are jointly consistent by fold
            val served = vBands.dirIds.intersect(vHashes.dirIds)
            val crossLosers =
              if (vBands.snapshotPath.isEmpty && served.isEmpty)
                b.select(col("doc_id")).limit(0)
              else {
                val regBands = spark.read
                  .parquet(vBands.pathsFor(served): _*)
                  .select(col("doc_id").as("doc_a"), col("b"), col("band_key")).persist()
                try {
                  val hotKeys = regBands.groupBy(col("b"), col("band_key"))
                    .agg(count(lit(1)).as("__bs")).filter(col("__bs") > maxBucket)
                    .select(col("b"), col("band_key"))
                  val cand = bands.join(regBands, Seq("b", "band_key"))
                    .join(hotKeys, Seq("b", "band_key"), "left_anti")
                    .select(col("doc_a"), col("doc_id").as("doc_b")).distinct()
                  val regHashes = spark.read
                    .parquet(vHashes.pathsFor(served): _*)
                    .select(col("doc_id").as("doc_a"), col("hashes").as("h_a"))
                  Dedup.jaccardVerify(cand, regHashes,
                      sh.select(col("doc_id").as("doc_b"), col("hashes").as("h_b")),
                      threshold)
                    .select(col("doc_b").as("doc_id")).distinct()
                    .localCheckpoint(true)
                } finally { regBands.unpersist(blocking = false); () }
              }
            val nearDropped = inBatch.union(crossLosers).distinct()

            // 3. per-doc gates (batching-independent), Curate's precedence
            val quality = TextAnalysis.qualityScore(b, cjk)
              .select(col("doc_id"), col("quality"), col("n_tokens"))
            val lang = TextAnalysis.langId(b).select(col("doc_id"), col("pred_lang"))
            // tokenize the STATIC benchmark in the same mode as the
            // batch, in BOTH modes (Curate.runLabeled's contract — both
            // sides of the contamination gram join must live in one
            // token space; binding only under cjk would honor a stray
            // differently-tokenized `toks` column on the latin path)
            val contam = benchmark.map { bench =>
              val bb = graft.functions.TokMode.bind(bench, cjk)
              TextAnalysis.contaminationTable(b, bb, contaminationN)
                .select(col("doc_id")).withColumn("__contam", lit(1))
            }
            val rep =
              if (maxDup3Frac < 1.0)
                Some(TextAnalysis.repetitionScore(b)
                  .select(col("doc_id"), col("dup_3gram_frac")))
              else None
            val goph = gopher.map(g =>
              TextAnalysis.gopherRules(b, g.minWords, g.maxWords, g.requiredStops)
                .select(col("doc_id"), col("keep").as("__goph_keep")))
            val cls = classifier.map(cg =>
              graft.operators.Classify.scoreTokens(b, cg.weights, cg.buckets)
                .select(col("doc_id"), col("pred").as("__cls_keep")))
            // static model tables → per-doc scoring is batching-independent
            val lmp = lm.map(g =>
              TextAnalysis.scoreLm(b, g.model)
                .select(col("doc_id"),
                  coalesce(col("lm_micro_avg") >= g.minMicroAvg, lit(true))
                    .as("__lm_keep")))
            val joined = b.select(col("doc_id"), col("text"))
              .join(exactDropped.withColumn("__ex", lit(1)), Seq("doc_id"), "left")
              .join(nearDropped.withColumn("__near", lit(1)), Seq("doc_id"), "left")
              .join(quality, Seq("doc_id"), "left")
              .join(lang, Seq("doc_id"), "left")
            val withGates = Seq(
              contam.map(c => (df: DataFrame) => df.join(c, Seq("doc_id"), "left")),
              rep.map(r => (df: DataFrame) => df.join(r, Seq("doc_id"), "left")),
              goph.map(g => (df: DataFrame) => df.join(g, Seq("doc_id"), "left")),
              cls.map(c => (df: DataFrame) => df.join(c, Seq("doc_id"), "left")),
              lmp.map(l => (df: DataFrame) => df.join(l, Seq("doc_id"), "left"))
            ).flatten.foldLeft(joined)((df, f) => f(df))
            val contamGate =
              if (contam.isDefined) col("__contam").isNotNull else lit(false)
            val repGate =
              if (rep.isDefined) coalesce(col("dup_3gram_frac"), lit(0.0)) > maxDup3Frac
              else lit(false)
            val gophGate =
              if (gopher.isDefined) not(coalesce(col("__goph_keep"), lit(false)))
              else lit(false)
            val clsGate =
              if (classifier.isDefined) not(coalesce(col("__cls_keep"), lit(false)))
              else lit(false)
            val lmGate =
              if (lm.isDefined) not(coalesce(col("__lm_keep"), lit(true)))
              else lit(false)
            val labeled = withGates
              .withColumn("quality", coalesce(col("quality"), lit(0.0)))
              .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
              .withColumn("drop_reason",
                when(col("__ex").isNotNull, lit("exact_dup"))
                  .when(col("__near").isNotNull, lit("near_dup"))
                  .when(contamGate, lit("contaminated"))
                  .when(repGate, lit("repetitive"))
                  .when(gophGate, lit("gopher_rules"))
                  .when(clsGate, lit("classifier"))
                  .when(lmGate, lit("lm_fluency"))
                  .when(col("quality") < minQuality, lit("low_quality"))
                  .when(col("pred_lang") === "und", lit("unknown_lang"))
                  .otherwise(lit("kept")))
              .select(col("doc_id"), col("text"), col("pred_lang"),
                col("quality"), col("n_tokens"), col("drop_reason"))

            labeled.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
            fps.write.mode("overwrite").parquet(s"$registryPath/fps/batch=$batchId")
            bands.write.mode("overwrite").parquet(s"$registryPath/bands/batch=$batchId")
            sh.select(col("doc_id"), col("hashes"))
              .write.mode("overwrite").parquet(s"$registryPath/hashes/batch=$batchId")
          }
        } finally {
          persisted.foreach(_.unpersist(blocking = false))
          Dedup.releaseSince(spark, dedupMark)
          ()
        }
      }
  }

  /** Every label the sink has emitted so far — the streaming accounting
    * surface (union of batch accountings). Serves the compacted snapshot
    * plus only batch dirs whose write COMMITTED (_SUCCESS) — the same
    * gating the registry reads apply, so a reader concurrent with a
    * crashed/in-flight batch write never sees a partial `batch=<id>`
    * directory. Read through this (not a whole-dir parquet read): once
    * compaction has folded, `outPath` holds snapshot AND batch dirs. */
  def labeledView(spark: org.apache.spark.sql.SparkSession, outPath: String): DataFrame = {
    val v = Registry.view(spark, outPath, outPath)
    if (v.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
          StructField("pred_lang", StringType), StructField("quality", DoubleType),
          StructField("n_tokens", LongType), StructField("drop_reason", StringType))))
    } else
      spark.read.parquet(v.paths: _*)
        .select(col("doc_id"), col("text"), col("pred_lang"), col("quality"),
          col("n_tokens"), col("drop_reason"))
  }

  /** Everything the sink has kept so far (the curated corpus view). */
  def keptView(spark: org.apache.spark.sql.SparkSession, outPath: String): DataFrame =
    labeledView(spark, outPath).filter(col("drop_reason") === "kept")
      .select(col("doc_id"), col("text"), col("pred_lang"), col("quality"), col("n_tokens"))

  /** Continuous corpus-health report: TextAnalysis.profile over the kept
    * set as of now — the one-row DESCRIBE-corpus surface an operator
    * polls while the sink runs (counts, dup mass, token volume, language
    * mix, quality micro-sum). Pure composition over keptView, so it
    * equals the batch profile of the same kept set by construction. */
  def profileView(spark: org.apache.spark.sql.SparkSession, outPath: String): DataFrame =
    TextAnalysis.profile(keptView(spark, outPath).select(col("doc_id"), col("text")))

  /** Content-addressed identity of the kept corpus as of now
    * (TextAnalysis.corpusVersion over keptView): a downstream consumer
    * (training job, embedding pass) polls this to decide whether its
    * cached derivation is stale. The digest is order-free and
    * duplicate-invariant, so it is batching-independent by construction
    * — equal to the batch stamp of the same kept set. */
  def versionView(spark: org.apache.spark.sql.SparkSession, outPath: String): DataFrame =
    TextAnalysis.corpusVersion(keptView(spark, outPath).select(col("doc_id"), col("text")))

  /** Live labeler-health report: per-class precision/recall/F1 of the
    * kept set's language-ID predictions against a GOLD judgment frame
    * (doc_id, lang) — the monitor that catches the labeler drifting as
    * the sink runs (a class collapsing shows up as its recall row, not
    * as a silent mix shift). Gold is static (human labels / a frozen
    * golden slice), the per-batch rule every gate model follows. Pure
    * composition over keptView, so it equals the batch scorecard of the
    * same kept set; stored pred_lang is recomputable from the stored
    * (scrubbed) text — StreamingSpec proves both. */
  def scorecardView(spark: org.apache.spark.sql.SparkSession, outPath: String,
      gold: DataFrame): DataFrame =
    graft.operators.Eval.classificationMetrics(
      keptView(spark, outPath).select(col("doc_id"), col("pred_lang"))
        .join(gold.select(col("doc_id"), col("lang")), Seq("doc_id")),
      col("pred_lang"), col("lang"))

  /** Term drift of the kept corpus against a FROZEN baseline
    * (TextAnalysis.termDrift ∘ keptView): the "is what we're ingesting
    * changing" monitor — top-k terms whose relative frequency moved most
    * vs the reference slice the operator froze (yesterday's kept set, a
    * golden corpus). Composition over the kept view, so it equals the
    * batch drift of the same kept set; the baseline side should be a
    * persisted/static frame (the LmGate static-model rule). */
  def driftView(spark: org.apache.spark.sql.SparkSession, outPath: String,
      baseline: DataFrame, k: Int = 50): DataFrame =
    TextAnalysis.termDrift(baseline,
      keptView(spark, outPath).select(col("doc_id"), col("text")), k)

  /** Training-layout snapshot over everything kept so far: each kept doc
    * with its deterministic shuffle position (Sampling.shuffleRank) and
    * sequence-pack assignment (Sampling.packSequencesScalable) — the
    * composition batch curation hands off to (t_curate_shuffled /
    * t_curate_packed / t_curate_layout), now derivable from the
    * continuous sink's state at any point.
    *
    * Resumability contract: both layouts are PURE FUNCTIONS of the kept
    * set (no RNG, no partition-order dependence), so a training job can
    * re-derive the exact same order and packing from any snapshot of the
    * sink's output. Pack assignments are additionally byte-stable under
    * append-only id growth (packSequences scaladoc); shuffle positions
    * re-derive exactly but naturally re-permute as the kept set grows —
    * pin a snapshot (or re-rank a frozen kept set) for a fixed epoch
    * order. Caller releases the layout's tracked caches via
    * Dedup.releaseCaches after the terminal action. */
  def trainingView(spark: org.apache.spark.sql.SparkSession, outPath: String,
      budget: Long = 512, shards: Int = 64, partitions: Int = 0): DataFrame = {
    val kept = keptView(spark, outPath)
    val ranked = Sampling.shuffleRank(kept.select(col("doc_id")), col("doc_id"), partitions)
      .select(col("doc_id"), col("shuffle_pos"))
    val packed = Sampling.packSequencesScalable(
      kept.select(col("doc_id"), col("text")), budget, shards, partitions)
    packed.join(ranked, "doc_id")
      .select(col("doc_id"), col("shuffle_pos"), col("shard"), col("pack_id"), col("n_tokens"))
  }

  /** Continuous CCNet-style fluency bucketing with FROZEN tertiles —
    * the streaming twin of [[TextAnalysis.lmBucketsFrozen]]. Exact
    * tertiles are a corpus-level property (a doc's lmBuckets label can
    * change as later docs shift the distribution), so the continuous
    * form freezes (t0, t1) from a batch profile over a reference corpus
    * ([[graft.operators.Sampling.boundedIntQuantiles]]) and labels each
    * micro-batch per doc: the label depends only on the doc, the STATIC
    * LM model, and the frozen thresholds, so the sink is
    * batching-independent by construction — stream ≡ batch across any
    * batch split and any registry fold boundary (StreamingSpec pins it
    * at compactEvery = 2). Rows (doc_id, lm_floor, bucket) land in
    * overwrite-idempotent `batch=<id>` dirs under the same compaction
    * protocol as the labeled sink, so [[lmBucketView]] stays
    * O(snapshot + compactEvery dirs) under continuous ingestion.
    *
    * At scale, per batch: scoreLm's gram-keyed join against the static
    * model tables plus one doc_id agg — the batch twin's audited shape;
    * the labeling itself is map-side. */
  def lmBucketSink(docs: DataFrame, model: TextAnalysis.LmModel,
      t0: Long, t1: Long, outPath: String,
      compactEvery: Int = 16): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        Registry.maybeCompact(spark, outPath, Seq(outPath),
          upToExclusive = batchId, every = compactEvery)
        val mark = Dedup.trackMark(spark)
        try {
          TextAnalysis.lmBucketsFrozen(
              TextAnalysis.scoreLm(batch.toDF(), model), t0, t1)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        } finally { Dedup.releaseSince(spark, mark); () }
      }

  /** Every frozen-tertile label the bucket sink has emitted so far —
    * the continuous head/middle/tail mix surface a curriculum or
    * temperature-mix stage consumes. Same commit gating as
    * [[labeledView]] (snapshot + _SUCCESS-committed batch dirs only). */
  def lmBucketView(spark: org.apache.spark.sql.SparkSession,
      outPath: String): DataFrame = {
    val v = Registry.view(spark, outPath, outPath)
    if (v.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("lm_floor", LongType), StructField("bucket", StringType))))
    } else
      spark.read.parquet(v.paths: _*)
        .select(col("doc_id"), col("lm_floor"), col("bucket"))
  }
}
