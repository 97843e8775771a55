package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded-state protocol for the incremental sinks' parquet registries.
  *
  * Without compaction every micro-batch adds a `batch=<id>` directory and
  * every trigger lists + unions ALL of them — at the reference's
  * continuous-ingestion posture (DimApp.java:23 / BaseLogApp.java:25 run
  * forever; a 10 s trigger is ~8,640 dirs/day per registry) the
  * per-trigger listing, parquet footer reads, and union-plan size grow
  * O(#batches) without bound. This object folds old batch dirs into one
  * snapshot per table and bounds every read to snapshot + `every`-ish
  * recent dirs.
  *
  * Layout (per registry GROUP — the set of sibling tables one sink writes
  * together each micro-batch, e.g. minhash's `bands` + `hashes`):
  *
  *  - `<table>/batch=<id>/`     — per-batch slice (overwrite-idempotent,
  *    _SUCCESS-gated), exactly as before;
  *  - `<table>/snapshot=<W>/`   — all rows of the jointly-committed batch
  *    dirs with id <= W, folded into one parquet dir;
  *  - `<groupBase>/_w=<W>`      — watermark MARKER (empty file; the NAME
  *    carries the value). The group watermark is the max over markers.
  *
  * Read protocol (`view`): serve `snapshot=<W>` plus the committed batch
  * dirs with id > W (own id excluded inside a sink body). Snapshot and
  * dirs are disjoint by construction, so every registered row is served
  * exactly once — multi-table sinks intersect the DIR id sets across
  * their tables exactly as before (snapshots need no intersection: a fold
  * only ever includes ids committed in EVERY table of the group).
  *
  * Retry/crash safety (foreachBatch is at-least-once):
  *  - a fold only covers ids < the CURRENT batch id, so a snapshot can
  *    never contain the running batch's own rows — the own-id-exclusion
  *    contract survives a crash-after-compaction retry;
  *  - the marker file is the commit point and is create-only (an atomic
  *    create — never a delete+rename window): a crash after writing
  *    snapshots but before the marker leaves the old watermark in force
  *    and the half-written snapshot invisible; the next fold recomputes a
  *    superset deterministically and overwrites;
  *  - cleanup runs AFTER the marker commit with one-cycle grace: batch
  *    dirs folded by the PREVIOUS watermark (and snapshots/markers older
  *    than it) are deleted, so a reader that listed its inputs just
  *    before the fold keeps every path it resolved for one full
  *    compaction interval.
  *
  * Contiguity assumption: micro-batches commit sequentially (batch N+1
  * only runs after N's foreachBatch succeeded), so at fold time every id
  * below the current batch is committed in all tables of the group. A
  * permanently half-committed id (abandoned stream) is never folded and
  * never served — the same "both tables committed" rule the dir readers
  * already apply.
  */
private[graft] object Registry {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Format-version guard for registries whose ROW CONTENT contract can
    * change across engine versions — e.g. the minhash `hashes` arrays are
    * SORTED since the fused-verify change, and a registry written by the
    * pre-sort engine would silently produce wrong Jaccard values if the
    * two-pointer merge consumed it. On a new/empty group the marker
    * `_format=<format>` is created; on an existing group missing it the
    * sink fails LOUDLY telling the operator to rebuild, instead of
    * quietly mis-verifying. Cheap per-batch (one exists() once created). */
  def ensureFormat(spark: SparkSession, groupBase: String, format: String): Unit = {
    val base = new Path(groupBase)
    val fs = fsOf(spark, base)
    val marker = new Path(base, s"_format=$format")
    if (fs.exists(marker)) return
    val hasData = fs.exists(base) && fs.listStatus(base).exists { st =>
      !st.getPath.getName.startsWith("_format=")
    }
    if (hasData) {
      val found = fs.listStatus(base).map(_.getPath.getName)
        .filter(_.startsWith("_format=")).mkString(", ")
      throw new IllegalStateException(
        s"registry at $groupBase was written with a different row format " +
          s"(want _format=$format, found ${if (found.isEmpty) "none" else found}) — " +
          "its contents would verify incorrectly under the current engine; " +
          "rebuild the registry (delete the directory and replay/re-ingest)")
    }
    fs.mkdirs(base)
    fs.create(marker, true).close()
  }

  /** Group watermark: max W over `_w=<W>` marker files; None before the
    * first compaction. */
  def watermark(spark: SparkSession, groupBase: String): Option[Long] = {
    val base = new Path(groupBase)
    val fs = fsOf(spark, base)
    if (!fs.exists(base)) None
    else fs.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_w="))
      .flatMap(n => scala.util.Try(n.stripPrefix("_w=").toLong).toOption)
      .maxOption
  }

  /** One table's read-set under the group watermark: the snapshot (if a
    * compaction has committed) plus the committed batch dirs above the
    * watermark, minus `excludeId`. */
  final case class View(snapshotPath: Option[String], dirIds: Seq[Long], table: String) {
    def isEmpty: Boolean = snapshotPath.isEmpty && dirIds.isEmpty
    def paths: Seq[String] = pathsFor(dirIds)
    /** Paths serving the snapshot plus exactly `ids` via dirs — multi-table
      * callers pass the intersection of their tables' dirIds. */
    def pathsFor(ids: Seq[Long]): Seq[String] =
      snapshotPath.toSeq ++ ids.map(id => s"$table/batch=$id")
  }

  def view(spark: SparkSession, groupBase: String, table: String,
      excludeId: Long = -1L): View = {
    val w = watermark(spark, groupBase)
    val ids = StreamingPipelines.completedBatches(spark, table)
      .filter(id => id != excludeId && w.forall(id > _))
    View(w.map(x => s"$table/snapshot=$x"), ids, table)
  }

  /** Fold the jointly-committed batch dirs in (watermark, upToExclusive)
    * of every table into per-table snapshots and advance the group
    * watermark — but only once at least `every` dirs are foldable, so
    * compaction cost amortizes over `every` batches. Returns true when a
    * fold ran. Call at the START of a sink body with
    * `upToExclusive = batchId`: folds never touch the running batch. */
  /** @param fold optional per-table post-union transform applied to the
    *   snapshot frame before it is written (default identity = plain
    *   row-union fold). Additive registries (e.g. sketch counters, whose
    *   state is (key → running sum)) pass an aggregation here so the
    *   snapshot re-collapses to one row per key — a union fold would
    *   carry every batch's partial rows forward and the snapshot would
    *   grow O(batches) instead of staying state-sized. The transform MUST
    *   be associative over re-folding (agg-of-agg == agg), which is
    *   exactly the mergeability contract (SketchSpec). */
  def maybeCompact(spark: SparkSession, groupBase: String, tables: Seq[String],
      upToExclusive: Long, every: Int,
      fold: Map[String, DataFrame => DataFrame] = Map.empty): Boolean = {
    require(every > 0, s"compactEvery must be positive, got $every")
    require(tables.nonEmpty, "registry group needs at least one table")
    val w = watermark(spark, groupBase)
    val committed = tables.map(t =>
      StreamingPipelines.completedBatches(spark, t)
        .filter(id => id < upToExclusive && w.forall(id > _)).toSet)
    val foldable = committed.reduce(_ intersect _).toSeq.sorted
    if (foldable.size < every) return false
    val wNew = foldable.max
    tables.foreach { t =>
      val in = w.map(x => s"$t/snapshot=$x").toSeq ++
        foldable.map(id => s"$t/batch=$id")
      fold.getOrElse(t, identity[DataFrame] _)(spark.read.parquet(in: _*))
        .write.mode("overwrite").parquet(s"$t/snapshot=$wNew")
    }
    // commit: atomic create of the new marker (the old one stays — the
    // watermark is the max, so there is no window with no marker at all)
    val marker = new Path(groupBase, s"_w=$wNew")
    fsOf(spark, marker).create(marker, true).close()
    // cleanup with one-cycle grace: everything at or below the PREVIOUS
    // watermark is covered by both the old and the new snapshot — safe to
    // drop now; dirs folded THIS cycle survive until the next one
    w.foreach { wOld =>
      tables.foreach { t =>
        val tp = new Path(t)
        val fs = fsOf(spark, tp)
        if (fs.exists(tp)) fs.listStatus(tp).foreach { st =>
          val n = st.getPath.getName
          val staleDir = n.startsWith("batch=") &&
            scala.util.Try(n.stripPrefix("batch=").toLong).toOption.exists(_ <= wOld)
          val staleSnap = n.startsWith("snapshot=") &&
            scala.util.Try(n.stripPrefix("snapshot=").toLong).toOption.exists(_ < wOld)
          if (staleDir || staleSnap) fs.delete(st.getPath, true)
        }
      }
      val bp = new Path(groupBase)
      val bfs = fsOf(spark, bp)
      if (bfs.exists(bp)) bfs.listStatus(bp).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("_w=") &&
            scala.util.Try(n.stripPrefix("_w=").toLong).toOption.exists(_ < wOld))
          bfs.delete(st.getPath, false)
      }
    }
    true
  }

  /** Keep only the newest `keep` committed `batch=<id>` dirs (used for
    * SELF-COMPLETE snapshot tables — winnowClusterSink's labels, where
    * every batch dir supersedes all earlier ones). Grace: keep >= 2 so a
    * reader that resolved the previous newest keeps its path. */
  def pruneKeepNewest(spark: SparkSession, path: String, keep: Int): Unit = {
    require(keep >= 2, s"keep must be >= 2 for reader grace, got $keep")
    val ids = StreamingPipelines.completedBatches(spark, path)
    val stale = ids.sorted.dropRight(keep)
    val base = new Path(path)
    val fs = fsOf(spark, base)
    stale.foreach(id => fs.delete(new Path(path, s"batch=$id"), true))
  }
}
