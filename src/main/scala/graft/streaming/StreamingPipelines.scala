package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured-Streaming forms of the reference pipelines (SURVEY §2.9):
  * watermarked tumbling windows, and foreachBatch sinks replacing the
  * Kafka/ClickHouse/Phoenix writers (K1–K5).
  */
object StreamingPipelines {

  /** Dws02 twin: 10-minute tumbling event-time window by event_type with a
    * 2-second watermark (the reference's out-of-orderness bound,
    * Dws02...java:157,173). Exact UV is computed upstream by
    * StatefulOps.dailyFirstVisits — streaming append mode cannot
    * countDistinct inside the window, same reason the reference splits
    * UV-dedup from the window reduce. */
  def trafficWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 seconds")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("pv_ct"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("event_type"), col("pv_ct"), col("sum_value"))

  /** J1 streaming form: watermarked stream-stream inner equi-join
    * (DwdTradeOrderDetail.java:161-163's order_detail ⋈ order_info under
    * Structured Streaming). Both sides carry event-time watermarks plus a
    * time-range condition so state is bounded — Spark drops join state
    * older than watermark + range, the same role as the blink planner's
    * state TTL. */
  def streamStreamJoin(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      condition: org.apache.spark.sql.Column,
      delay: String = "2 seconds"): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay), condition)

  /** J2 streaming form: watermark-range stream-stream LEFT OUTER join —
    * the reference's retraction-based streaming left join
    * (DwdTradeOrderDetail.java:164-167 emits +I/-D pairs as matches
    * arrive). Spark's model needs no retraction: a left row is held in
    * state and emitted null-extended ONLY once the watermark proves no
    * match can still arrive, so downstream sees exactly one final row per
    * outcome. Materialization composes with `upsertSink` (K3 latest-row
    * compaction) for the reference's MERGE-into-sink topology; the
    * stream≡batch equivalence is proven in StreamingSpec. */
  def streamStreamLeftJoin(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      condition: org.apache.spark.sql.Column,
      delay: String = "2 seconds"): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay), condition, "left_outer")

  /** K4 analog: append each micro-batch to parquet (stands in for the
    * ClickHouse JDBC batch sink — swap the body for df.write.jdbc).
    *
    * Delivery contract: AT-LEAST-ONCE, deliberately — a foreachBatch
    * retry appends the batch again, exactly like the reference's
    * non-transactional JDBC batch insert (its ClickHouse tables absorb
    * replays via ReplacingMergeTree-style dedup in the STORE). When the
    * store cannot dedup, use [[upsertSink]] (keyed latest-wins) or a
    * `batch=<id>`-dir sink (overwrite-idempotent) instead. */
  def parquetBatchSink(df: DataFrame, path: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode("append").parquet(path)
      }

  /** K3/K5 streaming upsert: maintain latest-row-per-key in a parquet
    * table via foreachBatch read→merge→swap (the Delta `MERGE INTO`
    * stand-in; with Delta on the cluster the body becomes one MERGE).
    * Write-to-temp-then-swap keeps the table readable mid-merge.
    *
    * Crash-safe across every window of the swap: a crash between
    * `delete(table)` and `rename(tmp, table)` leaves the table missing
    * but the temp dir COMPLETE (_SUCCESS) — the retry PROMOTES that temp
    * to the table first (one atomic rename; without it the retry would
    * rebuild the table from the one retried batch, silently dropping
    * every earlier key), then runs the normal merge, which is idempotent
    * (latest-per-key). Promotion-first also means the merge never reads
    * the dir it is about to overwrite. Paths resolve through their OWN
    * filesystem (hdfs://, s3a://, file:), and a failed rename is an
    * error, not a silent no-op. */
  def upsertSink(df: DataFrame, path: String, key: String, version: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val p = new org.apache.hadoop.fs.Path(path)
        val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        def renameOrThrow(): Unit =
          if (!fs.rename(tmp, p))
            throw new java.io.IOException(
              s"upsertSink: rename $tmp -> $p failed; table left in temp (recoverable)")
        // Table missing + temp present: decide by whether the temp WRITE
        // COMPLETED. A completed write has part files and no _temporary
        // staging dir (the committer removes it at job commit — with or
        // without the _SUCCESS marker, so marksuccessfuljobs=false cloud
        // committers recover too); completed + table missing can only be
        // a crash between delete and rename, so PROMOTE — proceeding with
        // current = batch-only would silently drop every earlier key. An
        // INCOMPLETE temp (_temporary still present, or no part files)
        // next to a missing table can only be the FIRST-ever batch killed
        // mid-write (delete(table) runs strictly after a completed temp
        // write, so any crash mid-write leaves an existing table intact):
        // no committed data has ever existed — clear the debris and build
        // from the batch. Promoting an incomplete temp would instead
        // expose readers to a row-incomplete table.
        if (!fs.exists(p) && fs.exists(tmp)) {
          val entries = fs.listStatus(tmp).map(_.getPath.getName)
          val complete = !entries.contains("_temporary") &&
            entries.exists(n => n == "_SUCCESS" || n.endsWith(".parquet"))
          if (complete) renameOrThrow() // promote the completed swap
          else fs.delete(tmp, true) // first batch died mid-write: restart it
        }
        val current =
          if (fs.exists(p)) spark.read.parquet(path).unionByName(batch.toDF())
          else batch.toDF()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)).orderBy(col(version).desc)
        val merged = current
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
        merged.write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(p)) fs.delete(p, true)
        renameOrThrow()
        ()
      }

  /** Incremental corpus dedup for continuous ingestion: a parquet
    * fingerprint REGISTRY (doc_id, fp — winnowing window-min hashes,
    * partitioned by batch id) accumulates every seen document's
    * fingerprints; each micro-batch drops documents sharing >= minShared
    * fingerprints with any earlier document (registry join, per-prior-doc
    * counts) or with an earlier-id document in the same batch
    * (Dedup.winnowPairs), writes survivors to `outPath`, and registers the
    * WHOLE batch's fingerprints (dropped docs too — a later near-dup of a
    * dropped doc must still be dropped, which is what makes the stream ≡
    * the batch drop-doc_b formulation; StreamingSpec proves it on an
    * id-ordered feed).
    *
    * Exactly-once under foreachBatch's at-least-once contract: both writes
    * overwrite a `batch=<id>` partition directory (idempotent on retry),
    * and the registry read EXCLUDES the current batch id — a half-written
    * previous attempt can neither self-match nor duplicate.
    *
    * Fingerprints that are ubiquitous in the REGISTRY (> maxBucket prior
    * docs — boilerplate) are excluded from matching, mirroring
    * winnowPairs' in-batch hot-bucket cap; the batch-vs-stream equivalence
    * is exact while every fingerprint stays under the cap (the spec's
    * regime), and both formulations degrade the same way past it.
    *
    * At scale the registry join shuffles on fp, exactly like winnowPairs'
    * candidate join; registry state grows with distinct fingerprints, not
    * events. */
  /** batch=<id> subdirs of `path` whose parquet commit FINISHED (the
    * _SUCCESS marker exists), ascending. A crashed write's partial dir
    * must never be served as a complete registry slice or snapshot. */
  private[streaming] def completedBatches(spark: SparkSession, path: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("batch=") &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("batch=").toLong).sorted
  }

  /** Cross-batch shared-fingerprint pairs for the winnow sinks: this
    * batch's exploded fingerprints vs the registry (earlier COMPLETED
    * batches only; own id excluded for retry safety), >= minShared shared
    * fingerprints per (old, new) doc pair, registry-ubiquitous fps
    * (> maxBucket prior docs — boilerplate) excluded. Returns
    * (old_doc, doc_id); persisted+materialized (registered in the caller's
    * Dedup scope) with the registry cache released before returning. */
  private def registryPairs(fps: DataFrame, registryPath: String, batchId: Long,
      minShared: Int, maxBucket: Int): DataFrame = {
    val spark = fps.sparkSession
    val v = Registry.view(spark, registryPath, registryPath, excludeId = batchId)
    if (v.isEmpty) fps.select(col("doc_id").as("old_doc"), col("doc_id")).limit(0)
    else {
      val reg = spark.read.parquet(v.paths: _*)
        .select(col("doc_id").as("old_doc"), col("fp")).persist()
      val hotFps = reg.groupBy(col("fp"))
        .agg(count(lit(1)).as("__bs")).filter(col("__bs") > maxBucket)
        .select(col("fp"))
      val p = fps.join(reg, "fp")
        .join(hotFps, Seq("fp"), "left_anti")
        .groupBy(col("doc_id"), col("old_doc"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minShared)
        .select(col("old_doc"), col("doc_id"))
      val out = graft.operators.Dedup.track(p.persist())
      out.count()
      reg.unpersist(blocking = false)
      out
    }
  }

  def winnowDedupSink(docs: DataFrame, registryPath: String, outPath: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2,
      maxBucket: Int = 1000, compactEvery: Int = 16): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // bound the registry read-set BEFORE this batch's reads: fold
        // batch dirs below this id into the snapshot every `compactEvery`
        // batches (Registry scaladoc has the retry/grace contract)
        Registry.maybeCompact(spark, registryPath, Seq(registryPath),
          upToExclusive = batchId, every = compactEvery)
        val dedupMark = graft.operators.Dedup.trackMark(spark)
        val b = batch.toDF().persist()
        // materialize the fingerprint table BEFORE exploding — Generate
        // over the raw winnow chain re-evaluates it per output row
        // (see Dedup.winnowPairs); the same materialized table feeds the
        // registry write AND the in-batch pair generation (one scan)
        val bw = graft.operators.Dedup.winnowTable(b, k, w).persist()
        val fps = bw.select(col("doc_id"), explode(col("fps")).as("fp")).persist()
        // a failed batch must still drop its caches and close its Dedup
        // scope — under the at-least-once retry contract a leak here
        // accumulates one set of InMemoryRelations per retried failure
        try {
          val droppedByRegistry =
            registryPairs(fps, registryPath, batchId, minShared, maxBucket)
              .select(col("doc_id")).distinct()
          val droppedInBatch = graft.operators.Dedup
            .winnowPairsFromTable(bw, minShared, maxBucket)
            .select(col("doc_b").as("doc_id")).distinct()
          val kept = b.join(
            droppedByRegistry.union(droppedInBatch).distinct(),
            Seq("doc_id"), "left_anti")
          kept.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
          fps.write.mode("overwrite").parquet(s"$registryPath/batch=$batchId")
        } finally {
          fps.unpersist(); bw.unpersist(); b.unpersist()
          graft.operators.Dedup.releaseSince(spark, dedupMark)
          ()
        }
      }

  /** Incremental MinHash+LSH near-dup removal for continuous ingestion —
    * the streaming twin of Curate's DEFAULT near-dup policy
    * (Dedup.minhashLshPairs, drop-doc_b), completing policy parity with
    * the winnow/exact/cluster/span incremental sinks. A parquet registry
    * accumulates every seen document's LSH bands
    * (`<registry>/bands/batch=<id>`) and 32-bit shingle-hash arrays
    * (`<registry>/hashes/batch=<id>`); each micro-batch drops documents
    * that Jaccard-verify >= `threshold` against ANY earlier document
    * (band-key join into the registry, exact verify against the stored
    * hash arrays) or against an earlier-id document in the same batch
    * (the shared minhashLshPairs stages over one shingle scan), writes
    * survivors to `outPath`, and registers the WHOLE batch (dropped docs
    * too — a later near-dup of a dropped doc must still drop, the
    * property that makes the stream ≡ the batch drop-doc_b formulation on
    * an id-ordered feed; StreamingSpec proves it).
    *
    * Exactly-once under foreachBatch's at-least-once contract: all three
    * writes overwrite `batch=<id>` partition dirs (idempotent on retry),
    * registry reads exclude the current batch id and serve only
    * batches with BOTH tables committed (_SUCCESS), so a half-written
    * attempt can neither self-match nor go half-registered.
    *
    * Band buckets that are ubiquitous in the REGISTRY (> maxBucket prior
    * docs — boilerplate) are excluded from cross-batch matching,
    * mirroring minhashLshPairs' in-batch cap; equivalence is exact while
    * buckets stay under the cap (the spec's regime) and both formulations
    * degrade the same way past it.
    *
    * At scale: the cross-batch join shuffles on (b, band_key) — the same
    * key minhashLshPairs self-joins on — and the verify ships 4-byte hash
    * arrays only for banded candidates; registry state grows with seen
    * documents' bands (numBands rows/doc), not with pairs. */
  def minhashDedupSink(docs: DataFrame, registryPath: String, outPath: String,
      numSigs: Int = 8, rowsPerBand: Int = 2, threshold: Double = 0.8,
      maxBucket: Int = 1000, compactEvery: Int = 16): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // refuse a registry whose hash arrays predate the sorted-array
        // contract (fused verify would silently mis-score)
        Registry.ensureFormat(spark, registryPath, "hashes-sorted-v2")
        // fold old (bands, hashes) batch dirs into snapshots every
        // `compactEvery` batches — one joint fold, so a snapshot only ever
        // holds ids committed in BOTH tables (Registry scaladoc)
        Registry.maybeCompact(spark, registryPath,
          Seq(s"$registryPath/bands", s"$registryPath/hashes"),
          upToExclusive = batchId, every = compactEvery)
        val dedupMark = graft.operators.Dedup.trackMark(spark)
        val b = batch.toDF().persist()
        // one shingle scan feeds in-batch pairs, cross-batch verify, AND
        // the registry write (persist before any explode/join fan-out)
        val sh = graft.operators.Dedup.shingleSets(b).persist()
        val bands = graft.operators.Dedup.bandsFromShingles(sh, numSigs, rowsPerBand).persist()
        try {
          val inBatch = graft.operators.Dedup
            .minhashPairsFromTables(sh, bands, threshold, maxBucket)
            .select(col("doc_b").as("doc_id")).distinct()
          val vb = Registry.view(spark, registryPath, s"$registryPath/bands", batchId)
          val vh = Registry.view(spark, registryPath, s"$registryPath/hashes", batchId)
          // dirs above the watermark still need the both-tables-committed
          // intersection; the snapshots are jointly consistent by fold
          val served = vb.dirIds.intersect(vh.dirIds)
          val crossLosers = if (vb.snapshotPath.isEmpty && served.isEmpty)
            b.select(col("doc_id")).limit(0)
          else {
            val regBands = spark.read
              .parquet(vb.pathsFor(served): _*)
              .select(col("doc_id").as("doc_a"), col("b"), col("band_key")).persist()
            try {
              val hotKeys = regBands.groupBy(col("b"), col("band_key"))
                .agg(count(lit(1)).as("__bs")).filter(col("__bs") > maxBucket)
                .select(col("b"), col("band_key"))
              val cand = bands.join(regBands, Seq("b", "band_key"))
                .join(hotKeys, Seq("b", "band_key"), "left_anti")
                .select(col("doc_a"), col("doc_id").as("doc_b")).distinct()
              val regHashes = spark.read
                .parquet(vh.pathsFor(served): _*)
                .select(col("doc_id").as("doc_a"), col("hashes").as("h_a"))
              val losers = graft.operators.Dedup.jaccardVerify(cand, regHashes,
                  sh.select(col("doc_id").as("doc_b"), col("hashes").as("h_b")), threshold)
                .select(col("doc_b").as("doc_id")).distinct()
                .localCheckpoint(true) // materialize before regBands unpersists
              losers
            } finally { regBands.unpersist(blocking = false); () }
          }
          val kept = b.join(inBatch.union(crossLosers).distinct(),
            Seq("doc_id"), "left_anti")
          kept.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
          bands.write.mode("overwrite").parquet(s"$registryPath/bands/batch=$batchId")
          sh.select(col("doc_id"), col("hashes"))
            .write.mode("overwrite").parquet(s"$registryPath/hashes/batch=$batchId")
        } finally {
          bands.unpersist(); sh.unpersist(); b.unpersist()
          graft.operators.Dedup.releaseSince(spark, dedupMark)
          ()
        }
      }

  /** Incremental transitive dup-clustering for continuous ingestion: the
    * cluster-keeper policy (Dedup.duplicateClusters) maintained across
    * micro-batches. Reuses winnowDedupSink's fingerprint registry for
    * candidate generation — each batch contributes its in-batch pairs
    * (Dedup.winnowPairs) plus registry-vs-batch pairs (shared-fingerprint
    * counts, same minShared/hot-fp cap) — and folds them into a LABELS
    * SNAPSHOT via Dedup.mergeClusters, so a batch that bridges two old
    * clusters relabels both. After batch n the snapshot equals
    * duplicateClusters(winnowPairs(all docs so far)) — StreamingSpec
    * proves the equivalence (cap regime, as winnowDedupSink).
    *
    * Exactly-once under foreachBatch's at-least-once contract: both the
    * registry write and the labels snapshot land in `batch=<id>`
    * directories (overwrite — idempotent on retry), the registry read
    * excludes the current batch id, and the labels read takes the newest
    * snapshot BELOW the current batch id — a half-written previous
    * attempt is invisible to its own retry.
    *
    * At scale: the registry join shuffles on fp; each fold's CC runs over
    * one row per clustered doc + this batch's pairs, not the historical
    * pair set. Label snapshots are pruned to the newest two each batch
    * (each is complete; two kept for reader grace), and the fingerprint
    * registry folds via Registry.maybeCompact like winnowDedupSink's. */
  def winnowClusterSink(docs: DataFrame, registryPath: String, labelsPath: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2,
      maxBucket: Int = 1000, compactEvery: Int = 16): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // fingerprint registry compacts like winnowDedupSink's; the labels
        // table is SELF-COMPLETE per batch, so its compaction is simply
        // dropping superseded snapshots (newest 2 kept for reader grace)
        Registry.maybeCompact(spark, registryPath, Seq(registryPath),
          upToExclusive = batchId, every = compactEvery)
        Registry.pruneKeepNewest(spark, labelsPath, keep = 2)
        val dedupMark = graft.operators.Dedup.trackMark(spark)
        val b = batch.toDF().persist()
        // materialize before exploding — see Dedup.winnowPairs; the same
        // table feeds the registry write AND in-batch pairs (one scan)
        val bw = graft.operators.Dedup.winnowTable(b, k, w).persist()
        val fps = bw.select(col("doc_id"), explode(col("fps")).as("fp")).persist()
        // failure must still drop caches + close the Dedup scope (see
        // winnowDedupSink)
        try {
          val crossPairs =
            registryPairs(fps, registryPath, batchId, minShared, maxBucket)
              .select(col("old_doc").as("doc_a"), col("doc_id").as("doc_b"))
          val newPairs = graft.operators.Dedup
            .winnowPairsFromTable(bw, minShared, maxBucket)
            .select(col("doc_a"), col("doc_b"))
            .unionByName(crossPairs)
          // newest COMPLETE snapshot below this batch id (retry-safe: a
          // half-written previous attempt has no _SUCCESS and own-id dirs
          // are excluded by the < filter)
          val prior = completedBatches(spark, labelsPath).filter(_ < batchId)
            .lastOption.map(id => spark.read.parquet(s"$labelsPath/batch=$id"))
          val labels = prior match {
            case Some(old) => graft.operators.Dedup.mergeClusters(old, newPairs)
            case None      => graft.operators.Dedup.duplicateClusters(newPairs)
          }
          labels.write.mode("overwrite").parquet(s"$labelsPath/batch=$batchId")
          fps.write.mode("overwrite").parquet(s"$registryPath/batch=$batchId")
        } finally {
          fps.unpersist(); bw.unpersist(); b.unpersist()
          graft.operators.Dedup.releaseSince(spark, dedupMark)
          ()
        }
      }

  /** The newest COMMITTED cluster-labels snapshot winnowClusterSink has
    * written (each finished snapshot is complete; a crashed write's
    * partial dir carries no _SUCCESS and is skipped — it would otherwise
    * be served as a labeling silently missing cluster members); empty
    * (doc_id, cluster) frame if none exists yet. */
  def currentClusters(spark: SparkSession, labelsPath: String): DataFrame =
    completedBatches(spark, labelsPath).lastOption match {
      case Some(id) => spark.read.parquet(s"$labelsPath/batch=$id")
      case None =>
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("doc_id", LongType), StructField("cluster", LongType))))
    }

  /** Incremental sub-document (span) dedup for continuous ingestion: each
    * micro-batch appends its documents' positional span rows and per-doc
    * span counts to a parquet REGISTRY (both under `batch=<id>` dirs —
    * overwrite, so foreachBatch retries are idempotent; no cross-batch
    * read happens inside the sink at all). The registry IS the tokenized
    * corpus in span form, so `currentSpanDedup` below can rebuild every
    * document seen so far against the GLOBAL span counts without
    * re-tokenizing anything — and the view is retroactive by
    * construction: a span whose corpus-wide count crosses `maxOcc` in
    * batch N disappears from batch-1 documents too, exactly like the
    * batch operator run over the full corpus (StreamingSpec proves
    * stream ≡ batch across 3 batches). */
  /** @param cjk character-offset mode (Dedup.dedupSpans cjk): the
    *   registry stores the doc's cjk CHUNK rows (span identity + [cs,
    *   ce) codepoint extent) plus lower_root(text) in the meta table, so
    *   [[currentSpanDedup]] can re-excise retroactively without
    *   re-tokenizing. The two modes write format-incompatible rows, so
    *   the registry carries a mode marker (Registry.ensureFormat) and a
    *   sink of the other mode refuses an existing registry LOUDLY. */
  def spanDedupSink(docs: DataFrame, spanPath: String, k: Int = 8,
      compactEvery: Int = 16, cjk: Boolean = false): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        Registry.ensureFormat(spark, spanPath,
          if (cjk) "cjk-chunks-v1" else "latin-spans-v1")
        // joint fold of (spans, meta) — currentSpanDedup's read-set stays
        // bounded at snapshot + ~compactEvery dirs per table
        Registry.maybeCompact(spark, spanPath,
          Seq(s"$spanPath/spans", s"$spanPath/meta"),
          upToExclusive = batchId, every = compactEvery)
        val b = batch.toDF().persist()
        try {
          if (cjk) {
            // materialize before exploding — Generate re-inlines the
            // chunk construction chain otherwise (see Dedup.winnowPairs)
            val ct = graft.operators.Dedup.chunkTableCjk(b, k).persist()
            try {
              ct.select(col("doc_id"), explode(col("chunks")).as("c"))
                .select(col("doc_id"), col("c.span").as("span"),
                  col("c.cs").as("cs"), col("c.ce").as("ce"))
                .write.mode("overwrite").parquet(s"$spanPath/spans/batch=$batchId")
              ct.select(col("doc_id"), col("lt"),
                  size(col("chunks")).cast("long").as("n_spans"))
                .write.mode("overwrite").parquet(s"$spanPath/meta/batch=$batchId")
            } finally { ct.unpersist(); () }
          } else {
            val st = graft.operators.Dedup.spanTable(b, k).persist()
            try {
              st.select(col("doc_id"), explode(col("spans")).as("s"))
                .select(col("doc_id"), col("s.pos").as("pos"), col("s.span").as("span"))
                .write.mode("overwrite").parquet(s"$spanPath/spans/batch=$batchId")
              st.select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"))
                .write.mode("overwrite").parquet(s"$spanPath/meta/batch=$batchId")
            } finally { st.unpersist(); () }
          }
        } finally {
          b.unpersist()
          ()
        }
      }

  /** The retroactive span-dedup snapshot over everything spanDedupSink has
    * registered: same output contract as Dedup.dedupSpans over the
    * corpus-so-far (one row per seen doc). Only batches with BOTH tables
    * committed (_SUCCESS) are served — the sink writes spans before meta,
    * so a crash between the two cannot surface a half-registered batch.
    * At scale this reads span rows (not raw text), bans by one span-keyed
    * agg, and rebuilds with one doc-keyed shuffle — re-tokenization never
    * happens twice. */
  def currentSpanDedup(spark: SparkSession, spanPath: String, maxOcc: Int = 1,
      cjk: Boolean = false): DataFrame = {
    val vs = Registry.view(spark, spanPath, s"$spanPath/spans")
    val vm = Registry.view(spark, spanPath, s"$spanPath/meta")
    val served = vs.dirIds.intersect(vm.dirIds)
    if (vs.snapshotPath.isEmpty && served.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
          StructField("n_spans", LongType), StructField("n_kept", LongType))))
    } else if (cjk) {
      val chunks = spark.read.parquet(vs.pathsFor(served): _*)
        .select(col("doc_id"), col("span"), col("cs"), col("ce"))
      val meta = spark.read.parquet(vm.pathsFor(served): _*)
        .select(col("doc_id"), col("lt"), col("n_spans"))
      graft.operators.Dedup.finishChunksCjk(meta, chunks, maxOcc)
    } else {
      val spans = spark.read.parquet(vs.pathsFor(served): _*)
        .select(col("doc_id"), col("pos"), col("span"))
      val meta = spark.read.parquet(vm.pathsFor(served): _*)
        .select(col("doc_id"), col("n_spans"))
      graft.operators.Dedup.finishSpans(meta, spans, maxOcc)
    }
  }

  /** Kept-document view under the transitive cluster-keeper policy, derived
    * from the labels snapshot winnowClusterSink maintains: each cluster's
    * keeper is its label (the min doc_id — exactly Curate's clusterDedup
    * rule), every other clustered doc is dropped, unclustered docs pass
    * through. Retroactively correct by construction: when a later batch
    * bridges two clusters the snapshot relabels both, so this view
    * contracts to exactly what the batch pipeline
    * (duplicateClusters ∘ winnowPairs) would keep over the corpus-so-far —
    * StreamingSpec asserts the equivalence. At scale this is one
    * left_anti shuffle on doc_id against a labels table with one row per
    * CLUSTERED doc (tiny next to the corpus; broadcastable in practice). */
  def keeperView(docs: DataFrame, labelsPath: String): DataFrame = {
    val losers = currentClusters(docs.sparkSession, labelsPath)
      .filter(col("doc_id") =!= col("cluster")).select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Streaming benchmark decontamination for continuous ingestion: the
    * batch `contaminationBloom` gate as a sink. The benchmark's n-gram
    * Bloom filter is built ONCE at sink construction
    * (TextAnalysis.benchmarkBloom — eval suites are static) and broadcast
    * once; every micro-batch is scored MAP-SIDE against the same broadcast
    * (zero corpus shuffle, zero per-trigger filter re-shipping) and its
    * clean documents land in `outPath/batch=<id>` (overwrite — idempotent
    * under foreachBatch's at-least-once retry contract, like the other
    * incremental sinks here).
    *
    * Same guarantees as the batch gate: NO false negatives (a doc sharing
    * a gram with the benchmark is always dropped) and false POSITIVES
    * bounded by fpp per probed gram — conservative in the safe direction
    * for an eval-leak gate. Stream ≡ batch is exact, not probabilistic:
    * the keep decision is a pure per-row function of (doc text, filter),
    * so batching cannot change it (StreamingSpec asserts union-of-batches
    * == batch filtering). */
  def decontaminationSink(docs: DataFrame, benchmark: DataFrame, outPath: String,
      n: Int = 4, fpp: Double = 1e-6): DataStreamWriter[Row] = {
    val spark = benchmark.sparkSession
    val bf = graft.operators.TextAnalysis.benchmarkBloom(benchmark, n, fpp)
    val bfB = bf.map(spark.sparkContext.broadcast(_))
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.toDF().persist()
        try {
          val contaminated = bfB match {
            case Some(broadcastFilter) =>
              graft.operators.TextAnalysis
                .bloomScoreBroadcast(b, broadcastFilter, n)
                .filter(col("n_bf_grams") > 0).select(col("doc_id"))
            case None => b.select(col("doc_id")).limit(0) // empty benchmark
          }
          b.join(contaminated, Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        } finally { b.unpersist(); () }
      }
  }

  /** Streaming SURGICAL span decontamination: the batch
    * TextAnalysis.decontaminateSpans gate as a sink — latin token-rebuild
    * mode or the cjk character-offset mode (overlapping-bigram spans
    * union; see the operator's @param cjk). The benchmark is STATIC (its
    * gram table is re-derived per batch from the same tiny frame — AQE
    * broadcasts it), and excision is a pure per-row function of
    * (doc text, benchmark grams), so stream ≡ batch EXACTLY at any
    * batching — StreamingSpec asserts union-of-batches == the batch
    * operator, cjk mode included. Each batch's excised corpus lands
    * idempotently in `outPath/batch=<id>` (overwrite — the at-least-once
    * foreachBatch retry contract of the other incremental sinks here);
    * the operator's registry-tracked persists are released per batch
    * (trackMark/releaseSince — a continuous stream must not accumulate
    * InMemoryRelations). */
  def spanExcisionSink(docs: DataFrame, benchmark: DataFrame, outPath: String,
      n: Int = 4, cjk: Boolean = false,
      preserveStructure: Boolean = false): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val mark = graft.operators.Dedup.trackMark(spark)
        try
          graft.operators.TextAnalysis
            .decontaminateSpans(batch.toDF(), benchmark, n, cjk, preserveStructure)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        finally { graft.operators.Dedup.releaseSince(spark, mark); () }
      }

  /** Incremental IMAGE near-dup removal for continuous ingestion — the
    * streaming twin of Images.nearDupPairs (drop-doc_b), completing
    * modality parity with the text-side minhash/winnow/exact/span
    * incremental sinks. Input is a (doc_id, img binary) stream; each
    * micro-batch decodes its images ONCE (Images.imageStats — the real
    * ImageIO pass), drops documents whose perceptual hash lands within
    * `maxHamming` of ANY earlier-registered image (band-key join into
    * the (doc_id, ahash) registry — tiny rows, 16 bytes of state per
    * image ever seen) or of an earlier-id image in the same batch (the
    * shared banded pair join), writes survivors to
    * `outPath/batch=<id>`, and registers the WHOLE batch — dropped docs
    * too, so a later near-dup of a dropped image still drops (the
    * property that makes the stream ≡ the batch drop-doc_b formulation
    * on an id-ordered feed; StreamingSpec proves it on the synthesized
    * fixture).
    *
    * Exactly-once under foreachBatch's at-least-once contract: both
    * writes overwrite `batch=<id>` dirs (idempotent on retry), registry
    * reads exclude the current batch id (Registry.view), and the
    * snapshot fold compacts the read-set every `compactEvery` batches.
    * Banding stays recall-LOSSLESS (hamming ≤ 3 over 4×16-bit bands —
    * the same pigeonhole bound the batch operator enforces), so there
    * is no probabilistic drift between stream and batch. */
  def imageDedupSink(imgs: DataFrame, registryPath: String, outPath: String,
      maxHamming: Int = 3, compactEvery: Int = 16): DataStreamWriter[Row] =
    fingerprintDedupSink(imgs, registryPath, outPath, maxHamming, compactEvery,
      hashCol = "ahash",
      stats = (spark, b) => graft.operators.Images.imageStats(spark, b))

  /** Incremental AUDIO near-dup removal — the streaming twin of
    * Audio.nearDupPairs (drop-doc_b), same registry protocol as
    * [[imageDedupSink]] over the block-energy fingerprint: input is a
    * (doc_id, audio binary) stream; each micro-batch decodes its clips
    * ONCE (Audio.audioStats — the real javax.sound pass) and registers
    * (doc_id, afp) rows — 16 bytes of state per clip ever seen. Same
    * exactly-once + recall-lossless contract (see the shared sink). */
  def audioDedupSink(clips: DataFrame, registryPath: String, outPath: String,
      maxHamming: Int = 3, compactEvery: Int = 16): DataStreamWriter[Row] =
    fingerprintDedupSink(clips, registryPath, outPath, maxHamming, compactEvery,
      hashCol = "afp",
      stats = (spark, b) => graft.operators.Audio.audioStats(spark, b))

  /** Incremental IMAGE CURATION — the streaming twin of
    * pipeline/MediaCurate.curateImages, same labeled-frame contract:
    * each micro-batch decodes once, applies the stateless gates
    * (undersized / flat / brightness — per-image predicates, identical
    * thresholds), and runs the near-dup gate among GATE SURVIVORS
    * against the (doc_id, ahash) survivor registry plus the in-batch
    * banded pair join. Only gate SURVIVORS register (matching the
    * batch rule that keepers are elected among survivors — a
    * gate-dropped image must never block a future near-dup), and
    * dropped-by-dedup survivors register too (a later near-dup of a
    * dropped survivor still drops, the imageDedupSink property).
    * Writes the FULL labeled frame per batch to `outPath/batch=<id>`
    * (doc_id, drop_reason) — stream ≡ batch on an id-ordered feed,
    * pinned in StreamingSpec. Same exactly-once posture as the dedup
    * sinks (idempotent batch=<id> overwrites, own-batch-excluded
    * registry reads, periodic compaction). */
  def imageCurateSink(imgs: DataFrame, registryPath: String, outPath: String,
      minPixels: Long = graft.pipeline.MediaCurate.Defaults.ImageMinPixels,
      minContrast: Int = graft.pipeline.MediaCurate.Defaults.ImageMinContrast,
      minMean: Int = graft.pipeline.MediaCurate.Defaults.ImageMinMean,
      maxMean: Int = graft.pipeline.MediaCurate.Defaults.ImageMaxMean,
      maxHamming: Int = graft.pipeline.MediaCurate.Defaults.MediaMaxHamming,
      compactEvery: Int = 16): DataStreamWriter[Row] = {
    require(minPixels > 0 && minContrast >= 0 && minMean <= maxMean,
      s"bad gate thresholds: minPixels=$minPixels minContrast=$minContrast " +
        s"mean=[$minMean,$maxMean]")
    mediaCurateSink(imgs, registryPath, outPath, maxHamming, compactEvery,
      hashCol = "ahash",
      profile = (spark, b) => graft.operators.Images.curationProfile(spark, b),
      gates = corruptGate +: imageGates(minPixels, minContrast, minMean, maxMean))
  }

  /** Incremental AUDIO CURATION — the streaming twin of
    * MediaCurate.curateAudio, same labeled-frame contract and the same
    * survivor-only registry protocol as [[imageCurateSink]] (shared
    * [[mediaCurateSink]]). */
  def audioCurateSink(clips: DataFrame, registryPath: String, outPath: String,
      minSamples: Long = graft.pipeline.MediaCurate.Defaults.AudioMinSamples,
      clipLevel: Int = graft.pipeline.MediaCurate.Defaults.AudioClipLevel,
      maxClipDenom: Long = graft.pipeline.MediaCurate.Defaults.AudioMaxClipDenom,
      silenceLevel: Int = graft.pipeline.MediaCurate.Defaults.AudioSilenceLevel,
      maxSilenceDenom: Long = graft.pipeline.MediaCurate.Defaults.AudioMaxSilenceDenom,
      maxHamming: Int = graft.pipeline.MediaCurate.Defaults.MediaMaxHamming,
      compactEvery: Int = 16): DataStreamWriter[Row] = {
    require(minSamples > 0 && maxClipDenom > 0 && maxSilenceDenom > 0,
      s"bad gate thresholds: minSamples=$minSamples clipDenom=$maxClipDenom " +
        s"silenceDenom=$maxSilenceDenom")
    mediaCurateSink(clips, registryPath, outPath, maxHamming, compactEvery,
      hashCol = "afp",
      profile = (spark, b) =>
        graft.operators.Audio.curationProfile(spark, b, clipLevel, silenceLevel),
      gates = corruptGate +: audioGates(minSamples, maxClipDenom, maxSilenceDenom))
  }

  /** Incremental VIDEO CURATION — the streaming twin of
    * MediaCurate.curateVideo, same labeled-frame contract and the same
    * survivor-only registry protocol as [[imageCurateSink]] (shared
    * [[mediaCurateSink]]). The profile pass is Video.gatedProfile —
    * header-only metadata gates, keyframe decoded ONLY for gate
    * survivors, corrupt containers LABELED (quarantined) rather than
    * thrown; the gate predicates here just read the profile's
    * precomputed drop0 label (null-safe `<=>` — drop0 is NULL for
    * survivors), so batch and stream share one gate definition. */
  def videoCurateSink(vids: DataFrame, registryPath: String, outPath: String,
      minPixels: Long = graft.pipeline.MediaCurate.Defaults.VideoMinPixels,
      minFrames: Long = graft.pipeline.MediaCurate.Defaults.VideoMinFrames,
      minFps: Long = graft.pipeline.MediaCurate.Defaults.VideoMinFps,
      maxFps: Long = graft.pipeline.MediaCurate.Defaults.VideoMaxFps,
      maxHamming: Int = graft.pipeline.MediaCurate.Defaults.VideoMaxHamming,
      compactEvery: Int = 16): DataStreamWriter[Row] = {
    require(minPixels > 0 && minFrames >= 1 && 0 < minFps && minFps <= maxFps,
      s"bad gate thresholds: minPixels=$minPixels minFrames=$minFrames " +
        s"fps=[$minFps,$maxFps]")
    mediaCurateSink(vids, registryPath, outPath, maxHamming, compactEvery,
      hashCol = "khash",
      profile = (spark, b) => graft.operators.Video.gatedProfile(
        spark, b, minPixels, minFrames, minFps, maxFps),
      gates = videoGates)
  }

  /** The shared gated-curation sink behind the image, audio and video
    * curation twins: per micro-batch — ONE decode (`profile`),
    * stateless gate labels in precedence order, near-dup among gate
    * SURVIVORS against the survivor-only fingerprint registry plus the
    * in-batch banded pair join (a gate-dropped item never blocks a
    * future near-dup — the batch rule that keepers are elected among
    * survivors), full labeled frame written per batch, survivors
    * registered (drops-by-dedup included, so a later near-dup of a
    * dropped survivor still drops). Same exactly-once posture as the
    * dedup sinks. */
  private def mediaCurateSink(media: DataFrame, registryPath: String,
      outPath: String, maxHamming: Int, compactEvery: Int, hashCol: String,
      profile: (SparkSession, DataFrame) => DataFrame,
      gates: Seq[(String, Column)]): DataStreamWriter[Row] = {
    graft.operators.Fingerprints.requireLossless(maxHamming)
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        Registry.maybeCompact(spark, registryPath, Seq(registryPath),
          upToExclusive = batchId, every = compactEvery)
        val dedupMark = graft.operators.Dedup.trackMark(spark)
        val b = batch.toDF().persist()
        val prof = profile(spark, b).persist()
        try {
          val (labeled, surv) = gatedLabelForBatch(spark, prof, registryPath,
            batchId, hashCol, maxHamming, gates)
          try {
            labeled.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
            surv.write.mode("overwrite").parquet(s"$registryPath/batch=$batchId")
          } finally { surv.unpersist(); () }
        } finally {
          prof.unpersist(); b.unpersist()
          graft.operators.Dedup.releaseSince(spark, dedupMark)
          ()
        }
      }
  }

  /** One modality's gated labeled frame for one micro-batch — the body
    * shared by the single-modality curation sinks and the cross-modal
    * [[mediaCurate3Sink]]: stateless gate labels, near-dup among gate
    * SURVIVORS against this modality's survivor-only registry plus the
    * in-batch banded pair join. `prof` must be persisted by the
    * caller; the returned survivor frame is persisted HERE and the
    * caller unpersists it after writing. Returns
    * (labeled(doc_id, drop_reason), survivors-to-register). */
  private def gatedLabelForBatch(spark: SparkSession, prof: DataFrame,
      registryPath: String, batchId: Long, hashCol: String, maxHamming: Int,
      gates: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val anyGate = gates.map(_._2).reduce(_ || _)
    val surv = prof.filter(!anyGate)
      .select(col("doc_id"), col(hashCol)).persist()
    val inBatch = graft.operators.Fingerprints
      .nearDupPairs(surv, hashCol, maxHamming)
      .select(col("doc_b").as("doc_id")).distinct()
    val v = Registry.view(spark, registryPath, registryPath,
      excludeId = batchId)
    val vsRegistry =
      if (v.isEmpty) surv.select(col("doc_id")).limit(0)
      else {
        val reg = spark.read.parquet(v.paths: _*)
          .select(col("doc_id"), col(hashCol))
        graft.operators.Fingerprints
          .hammingPairsAcross(surv, reg, hashCol, maxHamming)
          .select(col("doc_id")).distinct()
      }
    val dupped = inBatch.union(vsRegistry).distinct()
      .withColumn("__dup", lit(1))
    val label = gates.foldLeft(
        when(lit(false), lit(""))) { case (acc, (name, pred)) =>
      acc.when(pred, lit(name))
    }
      .when(col("__dup").isNotNull, lit("near_dup"))
      .otherwise(lit("kept"))
    val labeled = prof.join(dupped, Seq("doc_id"), "left")
      .select(col("doc_id"), label.as("drop_reason"))
    (labeled, surv)
  }

  /** Incremental THREE-modality curation — the streaming twin of
    * MediaCurate.curateMedia3 over a (doc_id, img, audio, video)
    * stream: each micro-batch runs all three gated chains (each with
    * its OWN survivor-only registry under `registryRoot/<modality>`,
    * the same protocol as the single-modality sinks), full-outer-joins
    * the per-modality labels and writes the cross-modal verdict frame
    * per batch — the verdict projection is
    * MediaCurate.verdict3Columns, ONE definition with the batch
    * pipeline. Thresholds are the batch defaults
    * (MediaCurate.Defaults — one definition). ALL THREE modalities
    * quarantine corrupt/undecodable binaries as a `corrupt` label
    * (the curation profiles catch decode failures — one bad scrape
    * file never kills the query); a doc absent from a modality's
    * input entirely cannot happen here (one row carries all three
    * columns), so verdict3Columns' missing_modality arms are
    * structurally unreachable in this sink — they exist for the batch
    * curateMedia3's separate-input shape. */
  def mediaCurate3Sink(media: DataFrame, registryRoot: String,
      outPath: String, compactEvery: Int = 16): DataStreamWriter[Row] = {
    val imgReg = s"$registryRoot/image"
    val audReg = s"$registryRoot/audio"
    val vidReg = s"$registryRoot/video"
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        for (r <- Seq(imgReg, audReg, vidReg))
          Registry.maybeCompact(spark, r, Seq(r),
            upToExclusive = batchId, every = compactEvery)
        val dedupMark = graft.operators.Dedup.trackMark(spark)
        val b = batch.toDF().persist()
        val D = graft.pipeline.MediaCurate.Defaults
        val imgProf = graft.operators.Images
          .curationProfile(spark, b.select(col("doc_id"), col("img")))
          .persist()
        val audProf = graft.operators.Audio
          .curationProfile(spark, b.select(col("doc_id"), col("audio")),
            D.AudioClipLevel, D.AudioSilenceLevel).persist()
        val vidProf = graft.operators.Video
          .gatedProfile(spark, b.select(col("doc_id"), col("video")),
            D.VideoMinPixels, D.VideoMinFrames, D.VideoMinFps,
            D.VideoMaxFps).persist()
        try {
          val (imgLbl, imgSurv) = gatedLabelForBatch(spark, imgProf, imgReg,
            batchId, "ahash", D.MediaMaxHamming,
            corruptGate +: imageGates(D.ImageMinPixels, D.ImageMinContrast,
              D.ImageMinMean, D.ImageMaxMean))
          val (audLbl, audSurv) = gatedLabelForBatch(spark, audProf, audReg,
            batchId, "afp", D.MediaMaxHamming,
            corruptGate +: audioGates(D.AudioMinSamples, D.AudioMaxClipDenom,
              D.AudioMaxSilenceDenom))
          val (vidLbl, vidSurv) = gatedLabelForBatch(spark, vidProf, vidReg,
            batchId, "khash", D.VideoMaxHamming, videoGates)
          try {
            imgLbl.select(col("doc_id"), col("drop_reason").as("image_reason"))
              .join(audLbl.select(col("doc_id"),
                col("drop_reason").as("audio_reason")), Seq("doc_id"), "full_outer")
              .join(vidLbl.select(col("doc_id"),
                col("drop_reason").as("video_reason")), Seq("doc_id"), "full_outer")
              .select(graft.pipeline.MediaCurate.verdict3Columns: _*)
              .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
            imgSurv.write.mode("overwrite").parquet(s"$imgReg/batch=$batchId")
            audSurv.write.mode("overwrite").parquet(s"$audReg/batch=$batchId")
            vidSurv.write.mode("overwrite").parquet(s"$vidReg/batch=$batchId")
          } finally {
            imgSurv.unpersist(); audSurv.unpersist(); vidSurv.unpersist(); ()
          }
        } finally {
          imgProf.unpersist(); audProf.unpersist(); vidProf.unpersist()
          b.unpersist()
          graft.operators.Dedup.releaseSince(spark, dedupMark)
          ()
        }
      }
  }

  /** The gate predicates, defined ONCE per modality and parameterized
    * by thresholds — the per-modality sinks pass their (defaulted)
    * params and [[mediaCurate3Sink]] passes MediaCurate.Defaults, so
    * no literal threshold is ever restated. */
  /** The corrupt quarantine gate shared by all three modalities — the
    * curation profiles emit a boolean `corrupt` column (decode failure
    * caught, never thrown) that precedes every threshold gate. */
  private def corruptGate: (String, Column) = "corrupt" -> col("corrupt")

  private def imageGates(minPixels: Long, minContrast: Int,
      minMean: Int, maxMean: Int): Seq[(String, Column)] = Seq(
    "undersized" -> (col("n_px") < minPixels),
    "flat" -> ((col("max_lum") - col("min_lum")) < minContrast),
    "brightness" -> (col("sum_lum") < lit(minMean.toLong) * col("n_px") ||
      col("sum_lum") > lit(maxMean.toLong) * col("n_px")))

  private def audioGates(minSamples: Long, maxClipDenom: Long,
      maxSilenceDenom: Long): Seq[(String, Column)] = Seq(
    "too_short" -> (col("n_samples") < minSamples),
    "clipped" -> (col("n_clipped") * maxClipDenom > col("n_samples")),
    "silent" -> (col("n_silent") * maxSilenceDenom > col("n_samples")))

  /** Video gates read the precomputed drop0 label from
    * Video.gatedProfile (null-safe — drop0 is NULL for survivors), so
    * batch and stream share one gate definition by construction. */
  private def videoGates: Seq[(String, Column)] = Seq(
    "corrupt" -> (col("drop0") <=> lit("corrupt")),
    "undersized" -> (col("drop0") <=> lit("undersized")),
    "too_few_frames" -> (col("drop0") <=> lit("too_few_frames")),
    "bad_fps" -> (col("drop0") <=> lit("bad_fps")))

  /** Incremental VIDEO near-dup removal — keyframe perceptual hashes
    * (decode ONLY frame 0 per video) through the same shared
    * fingerprint-registry protocol; default hamming 0 = exact keyframe
    * duplicates, codec-caveat-free (see Video.keyframeHashes). */
  def videoDedupSink(vids: DataFrame, registryPath: String, outPath: String,
      maxHamming: Int = 0, compactEvery: Int = 16): DataStreamWriter[Row] =
    fingerprintDedupSink(vids, registryPath, outPath, maxHamming, compactEvery,
      hashCol = "khash",
      stats = (spark, b) => graft.operators.Video.keyframeHashes(spark, b))

  /** Streaming EVAL-SET DECONTAMINATION — the streaming twin of
    * Fingerprints.decontaminate: filter a media stream against a
    * STATIC eval-set fingerprint frame (benchmark leakage never enters
    * the corpus). Per micro-batch: one decode pass (`stats`), then the
    * recall-lossless banded probe against the eval frame, labeled
    * (doc_id, <hashCol>, keep) written per batch. No registry and no
    * cross-batch state — the eval set is FIXED, so stream ≡ batch by
    * construction (pinned in StreamingSpec). The eval frame is hashes,
    * not binaries: the caller decodes the (small) eval set once, not
    * per batch. */
  def imageDecontaminateSink(imgs: DataFrame, evalHashes: DataFrame,
      outPath: String, maxHamming: Int = 3): DataStreamWriter[Row] =
    mediaDecontaminateSink(imgs, evalHashes, outPath, "ahash", maxHamming,
      (spark, b) => graft.operators.Images.imageStats(spark, b))

  def audioDecontaminateSink(clips: DataFrame, evalHashes: DataFrame,
      outPath: String, maxHamming: Int = 3): DataStreamWriter[Row] =
    mediaDecontaminateSink(clips, evalHashes, outPath, "afp", maxHamming,
      (spark, b) => graft.operators.Audio.audioStats(spark, b))

  def videoDecontaminateSink(vids: DataFrame, evalHashes: DataFrame,
      outPath: String, maxHamming: Int = 0): DataStreamWriter[Row] =
    mediaDecontaminateSink(vids, evalHashes, outPath, "khash", maxHamming,
      (spark, b) => graft.operators.Video.keyframeHashes(spark, b))

  private def mediaDecontaminateSink(media: DataFrame, evalHashes: DataFrame,
      outPath: String, hashCol: String, maxHamming: Int,
      stats: (SparkSession, DataFrame) => DataFrame): DataStreamWriter[Row] = {
    graft.operators.Fingerprints.requireLossless(maxHamming)
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF().persist()
        try {
          val hashes = stats(spark, b).select(col("doc_id"), col(hashCol))
          graft.operators.Fingerprints
            .decontaminate(hashes, evalHashes, hashCol, maxHamming)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        } finally { b.unpersist(); () }
      }
  }

  /** The shared fingerprint-registry dedup sink behind the image and
    * audio twins — ONE definition of the micro-batch protocol
    * (decode-once, in-batch banded pair join, registry band probe,
    * register the WHOLE batch including drops, idempotent batch=<id>
    * overwrites, periodic compaction), parametrized only by the
    * modality's decode pass and fingerprint column. The banding itself
    * is the shared [[graft.operators.Fingerprints]] machinery, so
    * stream ≡ batch by construction for every modality. */
  private def fingerprintDedupSink(media: DataFrame, registryPath: String,
      outPath: String, maxHamming: Int, compactEvery: Int, hashCol: String,
      stats: (SparkSession, DataFrame) => DataFrame): DataStreamWriter[Row] = {
    graft.operators.Fingerprints.requireLossless(maxHamming)
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        Registry.maybeCompact(spark, registryPath, Seq(registryPath),
          upToExclusive = batchId, every = compactEvery)
        val dedupMark = graft.operators.Dedup.trackMark(spark)
        val b = batch.toDF().persist()
        // decode once per media row: the same stats table feeds the
        // registry write, the in-batch pair join, and the registry probe
        val fps = stats(spark, b)
          .select(col("doc_id"), col(hashCol)).persist()
        try {
          val inBatch = graft.operators.Fingerprints
            .nearDupPairs(fps, hashCol, maxHamming)
            .select(col("doc_b").as("doc_id")).distinct()
          val v = Registry.view(spark, registryPath, registryPath,
            excludeId = batchId)
          val vsRegistry =
            if (v.isEmpty) fps.select(col("doc_id")).limit(0)
            else {
              val reg = spark.read.parquet(v.paths: _*)
                .select(col("doc_id"), col(hashCol))
              graft.operators.Fingerprints
                .hammingPairsAcross(fps, reg, hashCol, maxHamming)
                .select(col("doc_id")).distinct()
            }
          val dropped = inBatch.union(vsRegistry).distinct()
          b.join(dropped, Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
          fps.write.mode("overwrite").parquet(s"$registryPath/batch=$batchId")
        } finally {
          fps.unpersist(); b.unpersist()
          // the pair join's internal tracked persist (Fingerprints.
          // nearDupPairs) must not accumulate across micro-batches
          graft.operators.Dedup.releaseSince(spark, dedupMark)
          ()
        }
      }
  }

  /** K2 analog: dynamic per-record routing — one pass, fanned out by the
    * `sink_table` column (partitioned write ≈ Kafka sink's per-row topic).
    *
    * Delivery contract: AT-LEAST-ONCE on a foreachBatch retry, matching
    * the reference's non-transactional Kafka producer (its consumers
    * dedup downstream). Exactly-once routing belongs to the consumer
    * side here too — e.g. feed the routed output into [[upsertSink]] /
    * `sinks.BucketedUpsert` keyed on the record id, which is exactly
    * what the K3/K5 pipelines do. */
  def routedSink(df: DataFrame, basePath: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.persist()
        try
          batch.write.mode("append").partitionBy("sink_table").parquet(basePath)
        finally { batch.unpersist(); () }
      }

  /** Incremental count-min sketch: each micro-batch writes ITS OWN
    * depth×width counter table as `counters/batch=<id>`; the running
    * sketch is the element-wise SUM over snapshot + committed batch dirs
    * — exactly the mergeability contract SketchSpec proves, so
    * stream ≡ batch by construction at any batching. Compaction reuses
    * the registry fold protocol with a SUMMING transform (see
    * Registry.maybeCompact's `fold` param): the snapshot re-collapses to
    * ≤ depth·width rows every cycle, so registry state is model-sized
    * forever — a plain union fold would grow O(batches).
    *
    * The sketch shape is pinned by a `_shape=<depth>x<width>` marker on
    * first commit; a sink or reader with a different shape fails LOUD
    * (summing counters from different geometries would be silent
    * garbage — the BucketedUpsert layout-marker rule). */
  def sketchSink(obs: DataFrame, keyCol: String, registryPath: String,
      depth: Int = 4, width: Int = 4096,
      compactEvery: Int = 16): DataStreamWriter[Row] =
    obs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        requireShape(spark, registryPath, depth, width, createIfAbsent = true)
        val sumFold = (df: DataFrame) =>
          df.groupBy(col("r"), col("bucket")).agg(sum(col("c")).as("c"))
        Registry.maybeCompact(spark, registryPath,
          Seq(s"$registryPath/counters"),
          upToExclusive = batchId, every = compactEvery,
          fold = Map(s"$registryPath/counters" -> sumFold))
        val b = batch.toDF().persist()
        try
          graft.operators.Sketches
            .countMinCounters(b, col(keyCol), depth, width)
            .write.mode("overwrite")
            .parquet(s"$registryPath/counters/batch=$batchId")
        finally { b.unpersist(blocking = false); () }
      }

  /** The running counter table (element-wise sum of snapshot + committed
    * batch dirs) — one row per touched (r, bucket). */
  def currentSketch(spark: SparkSession, registryPath: String): DataFrame = {
    val v = Registry.view(spark, registryPath, s"$registryPath/counters")
    if (v.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField("r", IntegerType), StructField("bucket", LongType),
        StructField("c", LongType))))
    } else spark.read.parquet(v.paths: _*)
      .groupBy(col("r"), col("bucket")).agg(sum(col("c")).as("c"))
  }

  /** Point estimates against the running sketch for the caller's
    * candidate keys (shape read from the pinned marker). */
  def currentEstimate(spark: SparkSession, registryPath: String,
      keys: DataFrame, keyCol: String): DataFrame = {
    val (depth, width) = readShape(spark, registryPath)
    graft.operators.Sketches.countMinEstimate(
      keys, col(keyCol), currentSketch(spark, registryPath), depth, width)
  }

  private def shapePath(registryPath: String, depth: Int, width: Int) =
    new org.apache.hadoop.fs.Path(registryPath, s"_shape=${depth}x$width")

  private def requireShape(spark: SparkSession, registryPath: String,
      depth: Int, width: Int, createIfAbsent: Boolean): Unit = {
    val base = new org.apache.hadoop.fs.Path(registryPath)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val existing =
      if (fs.exists(base))
        fs.listStatus(base).map(_.getPath.getName)
          .filter(_.startsWith("_shape=")).toSeq
      else Seq.empty
    existing match {
      case Seq() if createIfAbsent =>
        fs.mkdirs(base)
        fs.create(shapePath(registryPath, depth, width), true).close()
      case Seq() =>
        throw new IllegalStateException(s"no sketch shape marker under $registryPath")
      case Seq(one) =>
        require(one == s"_shape=${depth}x$width",
          s"sketch shape mismatch under $registryPath: registry is $one, caller wants ${depth}x$width")
      case many =>
        throw new IllegalStateException(
          s"conflicting sketch shape markers under $registryPath: ${many.mkString(", ")}")
    }
  }

  /** Continuous corpus onboarding: every micro-batch of incoming docs is
    * labeled against a STATIC curated reference (graft.operators.Dedup
    * .dedupAgainst semantics — exact fingerprint hit / banded+verified
    * near hit / kept) and the labels land in `outPath/batch=<id>` under
    * the registry protocol. The reference index is built ONCE at sink
    * construction and persisted (fingerprints, capped band table,
    * shingle arrays — Dedup.prepareReference), so micro-batches pay
    * map/join work only, never the reference scans. The decision is
    * per-doc against static state, so stream ≡ batch at ANY batching —
    * the union of batch labels equals one dedupAgainst over the union
    * of batches (OnboardingSpec). Within-stream duplicates are
    * deliberately NOT tracked here (that is minhashDedupSink /
    * CurateStream's job); this sink answers exactly one question per
    * doc: "is it already in the curated corpus?" */
  def onboardingSink(docs: DataFrame, reference: DataFrame, outPath: String,
      numSigs: Int = 8, rowsPerBand: Int = 2, threshold: Double = 0.8,
      maxBucket: Int = 1000, compactEvery: Int = 16): DataStreamWriter[Row] = {
    val ref = graft.operators.Dedup.prepareReference(
      reference, numSigs, rowsPerBand, threshold, maxBucket)
    // materialize the index now: the first micro-batch should not absorb
    // the reference scans, and the persisted frames are shared by all
    ref.fpRef.count(); ref.bandsR.count(); ref.shR.count()
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        Registry.maybeCompact(spark, outPath, Seq(outPath),
          upToExclusive = batchId, every = compactEvery)
        val mark = graft.operators.Dedup.trackMark(spark)
        val b = batch.toDF().persist()
        try
          graft.operators.Dedup.dedupAgainstIndex(b, ref)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        finally {
          b.unpersist(blocking = false)
          // release THIS batch's per-doc caches; the reference index
          // frames belong to the sink's (earlier) scope and survive
          graft.operators.Dedup.releaseSince(spark, mark)
          ()
        }
      }
  }

  /** Every onboarding label so far (committed batches + snapshot). */
  def onboardedView(spark: SparkSession, outPath: String): DataFrame = {
    val v = Registry.view(spark, outPath, outPath)
    if (v.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField("doc_id", LongType), StructField("drop_reason", StringType))))
    } else spark.read.parquet(v.paths: _*)
      .select(col("doc_id"), col("drop_reason"))
  }

  // ===== Continuous count-anomaly alarm =====

  /** Continuously-maintained (key, bucket) event counts on the registry
    * protocol — the state behind the LIVE traffic alarm
    * ([[currentCountAnomalies]]): each micro-batch contributes its OWN
    * partial counts (one batch-sized agg, never the accumulated stream)
    * and the fold/read re-aggregation SUMS them. Sum is associative and
    * commutative, so snapshot + dirs re-agg is exact and the alarm is
    * batching-independent BY CONSTRUCTION — the same argument as the
    * corpus-version digest, here for additive state. Re-delivered
    * batches overwrite their own dir (exactly-once); registry state
    * compacts to one row per live (key, bucket). */
  def countSink(events: DataFrame, registryPath: String,
      keyCol: String = "event_type", tsCol: String = "ts",
      granularity: String = "day", compactEvery: Int = 16): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        Registry.maybeCompact(spark, registryPath, Seq(s"$registryPath/counts"),
          upToExclusive = batchId, every = compactEvery,
          fold = Map(s"$registryPath/counts" -> (sumCounts _)))
        graft.operators.Anomaly
          .bucketCounts(batch.toDF(), col(keyCol), col(tsCol), granularity)
          .write.mode("overwrite").parquet(s"$registryPath/counts/batch=$batchId")
        ()
      }

  /** The live count table: snapshot + committed dirs, summed per
    * (key, bucket) — read-time and fold-time use the same function, so
    * they cannot drift. */
  def currentCounts(spark: SparkSession, registryPath: String): DataFrame = {
    val v = Registry.view(spark, registryPath, s"$registryPath/counts")
    if (v.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField("key", StringType), StructField("bucket", TimestampType),
        StructField("c", LongType))))
    } else sumCounts(spark.read.parquet(v.paths: _*))
  }

  /** The live alarm: [[graft.operators.Anomaly.flagFromCounts]] over the
    * registry's count table — equals the batch `countAnomalies` of every
    * event ingested so far, at any batching and across fold boundaries
    * (AnomalySpec proves it). */
  def currentCountAnomalies(spark: SparkSession, registryPath: String,
      k: Int = 2): DataFrame =
    graft.operators.Anomaly.flagFromCounts(currentCounts(spark, registryPath), k)

  private def sumCounts(df: DataFrame): DataFrame =
    df.groupBy(col("key"), col("bucket")).agg(sum(col("c")).as("c"))

  // ===== Continuous ANN index (incremental IVF postings) =====

  /** Continuously-maintained IVF ANN index over an embedding stream: per
    * micro-batch, incoming vectors are assigned to a FROZEN centroid set
    * (one map-side `NearestCentroid` projection — zero exchanges, the
    * same codegen'd assign as batch `Ivf.index`) and the (vec_id, e, cid)
    * postings land in the registry protocol; a re-ingested vec_id
    * supersedes its earlier posting (last-write-wins upsert, the
    * "document re-embedded by a newer model run" shape). NULL embeddings
    * are dropped (no position in the space — the batch assign's
    * documented NULL rule).
    *
    * The model is frozen by design, like `lmBucketsFrozen`: a silently
    * retraining index would make served neighbors depend on batching.
    * The centroid set is collected ONCE at sink construction (k rows —
    * driver-tiny), rebuilt per batch from those literals (no lineage
    * replay), and fingerprinted into a create-only `_model=<hash>`
    * marker: a sink or reader holding different centroids fails LOUD
    * instead of mixing postings assigned under two models (the sketch
    * `_shape` / BucketedUpsert layout-marker rule). Retraining =
    * rebuild-from-source into a fresh registry, then switch readers.
    *
    * Scale: the per-batch work is one scan of the batch (assign is
    * exchange-free); compaction's fold collapses superseded postings so
    * the snapshot holds one row per live vec_id — registry state is
    * index-sized (it IS the index), never O(batches). Reads touch the
    * snapshot + ≤ `compactEvery`-ish recent dirs. */
  def ivfIndexSink(vectors: DataFrame, centroids: DataFrame, registryPath: String,
      compactEvery: Int = 16): DataStreamWriter[Row] = {
    val model = collectModel(centroids)
    require(model.nonEmpty, "ivfIndexSink needs a non-empty centroid set")
    val hash = modelHash(model)
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        requireModel(spark, registryPath, hash, createIfAbsent = true)
        Registry.maybeCompact(spark, registryPath, Seq(s"$registryPath/postings"),
          upToExclusive = batchId, every = compactEvery,
          fold = Map(s"$registryPath/postings" -> (latestPostings _)))
        val b = batch.toDF().persist()
        try
          graft.operators.Ivf.index(b, modelFrame(spark, model))
            .filter(col("cid").isNotNull)
            .select(col("vec_id"), col("e"), col("cid").cast("long").as("cid"),
              lit(batchId).as("__b"))
            .write.mode("overwrite").parquet(s"$registryPath/postings/batch=$batchId")
        finally { b.unpersist(blocking = false); () }
      }
  }

  /** The live index: snapshot + committed batch dirs, collapsed to the
    * newest posting per vec_id — the same fold compaction applies, so
    * read-time and fold-time dedup cannot drift. */
  def currentIvfIndex(spark: SparkSession, registryPath: String): DataFrame = {
    val v = Registry.view(spark, registryPath, s"$registryPath/postings")
    if (v.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField("vec_id", LongType), StructField("e", ArrayType(DoubleType)),
        StructField("cid", LongType), StructField("__b", LongType))))
        .drop("__b")
    } else latestPostings(spark.read.parquet(v.paths: _*)).drop("__b")
  }

  /** Serve IVF top-k from the live index. The caller's centroids must be
    * THE model the registry was built under — checked against the pinned
    * marker, loud on mismatch. */
  def currentIvfTopK(spark: SparkSession, registryPath: String,
      centroids: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    requireModel(spark, registryPath, modelHash(collectModel(centroids)),
      createIfAbsent = false)
    graft.operators.Ivf.topK(
      currentIvfIndex(spark, registryPath).withColumn("cid",
        col("cid").cast(centroids.schema("cid").dataType)),
      centroids, queries, k, nprobe)
  }

  /** Newest posting per vec_id: argmax (__b, cid, e) — associative (max
    * of max), so re-folding a snapshot with later dirs is exact. */
  private def latestPostings(df: DataFrame): DataFrame =
    df.groupBy(col("vec_id"))
      .agg(max(struct(col("__b"), col("cid"), col("e"))).as("m"))
      .select(col("vec_id"), col("m").getField("e").as("e"),
        col("m").getField("cid").as("cid"), col("m").getField("__b").as("__b"))

  /** Continuous RESIDUAL-PQ index: the compressed-domain twin of
    * [[ivfIndexSink]]. Each micro-batch assigns its vectors to the FROZEN
    * coarse centroids, encodes the cell-centered residual against the
    * FROZEN per-block codebook ([[graft.operators.Pq.encodeResidual]]),
    * and writes (vec_id, cid, codes) postings — m small ints per vector
    * instead of dim doubles, the representation a 100 TB serving index
    * actually stores (raw embeddings stay in the corpus table and are
    * read only for the rerank·k finalists at query time). Same registry
    * contract as the IVF sink: last-write-wins per vec_id, batch-id
    * partition overwrite (idempotent retries), fold compaction, and a
    * create-only `_model=` marker that now covers BOTH models — a drifted
    * centroid set OR codebook fails loud instead of silently mixing code
    * spaces. */
  def pqIndexSink(vectors: DataFrame, centroids: DataFrame, codebook: DataFrame,
      registryPath: String, dim: Int, m: Int = 8,
      compactEvery: Int = 16): DataStreamWriter[Row] = {
    val cModel = collectModel(centroids)
    require(cModel.nonEmpty, "pqIndexSink needs a non-empty centroid set")
    val cbModel = collectCodebookModel(codebook)
    require(cbModel.nonEmpty, "pqIndexSink needs a non-empty codebook")
    val hash = pqModelHash(cModel, cbModel)
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        requireModel(spark, registryPath, hash, createIfAbsent = true)
        Registry.maybeCompact(spark, registryPath, Seq(s"$registryPath/codes"),
          upToExclusive = batchId, every = compactEvery,
          fold = Map(s"$registryPath/codes" -> (latestCodes _)))
        val b = batch.toDF().persist()
        try {
          val idx = graft.operators.Ivf.index(b, modelFrame(spark, cModel))
            .filter(col("cid").isNotNull).persist()
          try
            graft.operators.Pq
              .encodeResidual(idx, modelFrame(spark, cModel),
                codebookFrame(spark, cbModel), dim, m)
              .join(idx.select(col("vec_id"), col("cid").cast("long").as("cid")),
                "vec_id")
              .select(col("vec_id"), col("cid"), col("codes"), lit(batchId).as("__b"))
              .write.mode("overwrite").parquet(s"$registryPath/codes/batch=$batchId")
          finally { idx.unpersist(blocking = false); () }
        } finally { b.unpersist(blocking = false); () }
      }
  }

  /** The live compressed index: (vec_id, cid, codes), newest per vec_id. */
  def currentPqIndex(spark: SparkSession, registryPath: String): DataFrame = {
    val v = Registry.view(spark, registryPath, s"$registryPath/codes")
    if (v.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField("vec_id", LongType), StructField("cid", LongType),
        StructField("codes", ArrayType(IntegerType)), StructField("__b", LongType))))
        .drop("__b")
    } else latestCodes(spark.read.parquet(v.paths: _*)).drop("__b")
  }

  /** Serve residual-IVF-PQ top-k from the live compressed index. The
    * caller's centroids AND codebook must be THE models the registry was
    * built under (pinned marker, loud on mismatch); `vectors` is the raw
    * corpus store, read only for the exact re-rank of the finalists. */
  def currentPqTopK(spark: SparkSession, registryPath: String,
      centroids: DataFrame, codebook: DataFrame, vectors: DataFrame,
      queries: DataFrame, dim: Int, k: Int, nprobe: Int, m: Int = 8,
      rerank: Int = 4): DataFrame = {
    requireModel(spark, registryPath,
      pqModelHash(collectModel(centroids), collectCodebookModel(codebook)),
      createIfAbsent = false)
    val idx = currentPqIndex(spark, registryPath)
      .withColumn("cid", col("cid").cast(centroids.schema("cid").dataType))
    graft.operators.Pq.ivfPqResidualTopK(
      idx.select(col("vec_id"), col("cid")), centroids,
      idx.select(col("vec_id"), col("codes")), codebook,
      vectors, queries, dim, k, nprobe, m, rerank)
  }

  /** Newest code row per vec_id — same associative argmax contract as
    * [[latestPostings]]. */
  private def latestCodes(df: DataFrame): DataFrame =
    df.groupBy(col("vec_id"))
      .agg(max(struct(col("__b"), col("cid"), col("codes"))).as("m"))
      .select(col("vec_id"), col("m").getField("cid").as("cid"),
        col("m").getField("codes").as("codes"), col("m").getField("__b").as("__b"))

  private def collectCodebookModel(codebook: DataFrame): Seq[(Long, Long, Seq[Double])] =
    codebook.select(col("b").cast("long"), col("cid").cast("long"), col("ce"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toVector)).toSeq
      .sortBy(t => (t._1, t._2))

  private def codebookFrame(spark: SparkSession,
      model: Seq[(Long, Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    model.toDF("b", "cid", "ce")
      .select(col("b").cast("int").as("b"), col("cid").cast("int").as("cid"), col("ce"))
  }

  private def pqModelHash(cModel: Seq[(Long, Seq[Double])],
      cbModel: Seq[(Long, Long, Seq[Double])]): String =
    modelHash(cModel) + "-" + modelHash(
      cbModel.map { case (b, cid, ce) => (b << 32 | cid, ce) })

  private def collectModel(centroids: DataFrame): Seq[(Long, Seq[Double])] =
    centroids.select(col("cid").cast("long"), col("ce")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector)).toSeq.sortBy(_._1)

  private def modelHash(model: Seq[(Long, Seq[Double])]): String = {
    val canon = model
      .map { case (cid, ce) => s"$cid:" + ce.map(_.toString).mkString(",") }
      .mkString(";")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def modelFrame(spark: SparkSession, model: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    model.toDF("cid", "ce")
  }

  private def requireModel(spark: SparkSession, registryPath: String,
      hash: String, createIfAbsent: Boolean): Unit = {
    val base = new org.apache.hadoop.fs.Path(registryPath)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val existing =
      if (fs.exists(base))
        fs.listStatus(base).map(_.getPath.getName)
          .filter(_.startsWith("_model=")).toSeq
      else Seq.empty
    existing match {
      case Seq() if createIfAbsent =>
        fs.mkdirs(base)
        fs.create(new org.apache.hadoop.fs.Path(base, s"_model=$hash"), true).close()
      case Seq() =>
        throw new IllegalStateException(s"no IVF model marker under $registryPath")
      case Seq(one) =>
        require(one == s"_model=$hash",
          s"IVF model mismatch under $registryPath: registry was built with " +
            s"$one, caller holds _model=$hash — rebuild the index for a new model")
      case many =>
        throw new IllegalStateException(
          s"conflicting IVF model markers under $registryPath: ${many.mkString(", ")}")
    }
  }

  private def readShape(spark: SparkSession, registryPath: String): (Int, Int) = {
    val base = new org.apache.hadoop.fs.Path(registryPath)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val markers =
      if (fs.exists(base))
        fs.listStatus(base).map(_.getPath.getName)
          .filter(_.startsWith("_shape=")).toSeq
      else Seq.empty
    markers match {
      case Seq(one) =>
        val Array(d, w) = one.stripPrefix("_shape=").split("x")
        (d.toInt, w.toInt)
      case Seq() =>
        throw new IllegalStateException(s"no sketch shape marker under $registryPath")
      case many =>
        throw new IllegalStateException(
          s"conflicting sketch shape markers under $registryPath: ${many.mkString(", ")}")
    }
  }
}
