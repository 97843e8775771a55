package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Bucket-partitioned keyed upsert — the MERGE INTO stand-in that scales
  * past dim-sized tables (reference upsert surface:
  * gmall-realtime-self/.../app/func/DIM_SinkFunction.java:28-92 writes
  * keyed upserts row-at-a-time into Phoenix; ClickHouse's merge-on-read
  * engine plays the same role at MyClickhouseUtil.java:57-102).
  *
  * `ConfigRouter.upsertRoutes` / `StreamingPipelines.upsertSink` rewrite
  * the WHOLE table per batch — correct, and bounded for dim tables, but a
  * full-table rewrite per micro-batch at fact scale is O(table) I/O for
  * O(batch) changes. This sink partitions the table by a stable hash
  * bucket of the primary key (`bucket=<b>` directories, b =
  * pmod(xxhash64(pk), nBuckets)) and each upsert:
  *
  *  1. computes the batch's TOUCHED buckets (distinct hash of its keys —
  *     at most nBuckets values, driver-tiny);
  *  2. reads ONLY those bucket directories back (partition pruning on the
  *     bucket column — untouched buckets are never opened);
  *  3. latest-row-per-key merges batch ∪ existing (version desc, then a
  *     deterministic full-row hash tie-break — the upsertRoutes rule);
  *  4. rewrites ONLY the touched buckets via dynamic partition overwrite
  *     (one job, no driver loop; untouched directories are untouched).
  *
  * I/O per batch is O(touched buckets), not O(table): a 64-bucket fact
  * table absorbing a 1-bucket batch rewrites 1/64th of itself. At 100 TB
  * `nBuckets` is sized so a bucket ≈ an executor-friendly rewrite unit.
  *
  * Retry safety (foreachBatch is at-least-once): the merge is a pure
  * latest-wins function of (existing, batch), so re-applying the same
  * batch — even over a partially-rewritten table — converges to the same
  * rows; dynamic overwrite replaces whole bucket directories, never
  * appends duplicates. Like the other parquet sinks, per-directory
  * replacement (not a transaction log) is the stand-in: with Delta on the
  * cluster this whole object becomes `MERGE INTO` on a bucketed table.
  *
  * SINGLE-WRITER CONTRACT: without a transaction log there is no
  * cross-writer conflict detection — two concurrent upserts would each
  * read pre-merge buckets and the later commit would silently drop the
  * earlier one's rows (lost update, not corruption, but wrong). Each
  * upsert therefore takes a sidecar writer lock (atomic
  * create-if-absent; released in a finally) and a second writer fails
  * LOUDLY instead of silently losing updates. A writer that dies without
  * running its finally (driver kill -9) leaves a stale lock: the error
  * message carries the holder's pid/timestamp and [[breakLock]] is the
  * operator override — exactly the posture of Delta's lock-free
  * alternative, minus automation. (Atomic create-if-absent holds on
  * HDFS/local/ABFS; on S3 it is best-effort — the same reason Delta
  * needs a LogStore there.) Concurrent READERS are unaffected (see
  * [[read]]'s visibility contract).
  */
object BucketedUpsert {

  private val BucketCol = "bucket"
  private val LayoutMarker = "_graft_buckets"
  private val LockMarker = "_graft_writer_lock"

  private def lockPath(path: String) = new org.apache.hadoop.fs.Path(path + "." + LockMarker)

  /** Acquire the table's writer lock or fail loudly naming the holder. */
  private def acquireLock(spark: SparkSession, path: String): Unit = {
    val lock = lockPath(path)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val holder = s"pid=${ProcessHandle.current().pid()} acquired=${java.time.Instant.now()}"
    var created = false
    try {
      val out = fs.create(lock, false) // overwrite=false: atomic create-if-absent
      created = true
      try out.write(holder.getBytes("UTF-8")) finally out.close()
    } catch {
      // our OWN holder-info write failed after the create succeeded:
      // release the lock we just made and rethrow the real error —
      // reporting it as "held by a concurrent writer" (quoting our own
      // empty file) would orphan the lock until a manual breakLock
      case t: Throwable if created =>
        fs.delete(lock, false)
        throw t
      case _: org.apache.hadoop.fs.FileAlreadyExistsException | _: java.io.IOException
          if fs.exists(lock) =>
        val held = try {
          val in = fs.open(lock)
          try new String(in.readAllBytes(), "UTF-8") finally in.close()
        } catch { case _: java.io.IOException => "<unreadable>" }
        throw new IllegalStateException(
          s"BucketedUpsert: concurrent upsert on $path — writer lock held ($held). " +
            "A second writer would silently lose updates (no transaction log). If the " +
            "holder crashed without releasing, clear it with BucketedUpsert.breakLock.")
    }
  }

  private def releaseLock(spark: SparkSession, path: String): Unit = {
    val lock = lockPath(path)
    lock.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(lock, false)
    ()
  }

  /** Operator override for a stale writer lock (the holder crashed before
    * its finally). Returns true if a lock was present and removed. */
  def breakLock(spark: SparkSession, path: String): Boolean = {
    val lock = lockPath(path)
    lock.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(lock, false)
  }

  /** A NULL pk has no merge identity — xxhash64(NULL) would silently
    * collapse every null-keyed row ever upserted into one surviving row
    * (one bucket, one window group). Fail LOUDLY at execution instead;
    * the check is part of the bucket projection, so it costs no extra
    * pass over the batch. */
  private def withBucket(df: DataFrame, pk: String, nBuckets: Int): DataFrame =
    df.withColumn(BucketCol,
      when(col(pk).isNull, raise_error(
        lit(s"BucketedUpsert: NULL primary key '$pk' has no merge identity — " +
          "filter null-keyed rows before upsert")))
        .otherwise(pmod(xxhash64(col(pk).cast("string")), lit(nBuckets.toLong))))

  /** nBuckets is a TABLE LAYOUT property, not a per-call knob: a later
    * upsert hashing with a different modulus would look for keys in the
    * wrong bucket directories and silently duplicate (or fail to update)
    * rows. The first write pins the layout in a sidecar marker; every
    * subsequent upsert validates against it and fails loudly on mismatch. */
  /** The layout marker's pinned bucket count, if the table has one. */
  private def pinnedBuckets(spark: SparkSession, path: String): Option[Int] = {
    val marker = new org.apache.hadoop.fs.Path(path + "." + LayoutMarker)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      Some(try new String(in.readAllBytes(), "UTF-8").trim.toInt finally in.close())
    }
  }

  private def pinLayout(spark: SparkSession, path: String, nBuckets: Int,
      tableExists: Boolean): Unit = {
    val marker = new org.apache.hadoop.fs.Path(path + "." + LayoutMarker)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    pinnedBuckets(spark, path) match {
      case Some(pinned) => require(pinned == nBuckets,
        s"bucketed table at $path is laid out with nBuckets=$pinned; " +
          s"upsert called with nBuckets=$nBuckets would corrupt the keyed merge")
      case None =>
        require(!tableExists,
          s"bucketed table at $path exists without a $LayoutMarker layout marker — " +
            "refusing to guess its bucket count")
        val out = fs.create(marker, true)
        try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Upsert `batch` into the bucketed table at `path` (created on first
    * use). Latest row per `pk` wins, ordered by `version` descending with
    * a deterministic row-hash tie-break.
    *
    * Snapshot durability (`durableStage`): the merge must be materialized
    * before the overwrite because the write replaces the very directories
    * its input scan reads. Default (false) snapshots via localCheckpoint —
    * unreplicated executor-local blocks, so losing an executor mid-write
    * fails the JOB (no lineage to rebuild the snapshot); nothing corrupts
    * — the table still holds complete pre-merge buckets and the
    * foreachBatch retry re-runs the whole idempotent merge — but the
    * retry re-pays the full merge. With durableStage=true the merge lands
    * in a hidden `.staging-merge` dir on the table's filesystem first and
    * the overwrite reads THAT: an executor loss mid-overwrite recomputes
    * from durable staging (task-level retry, no job restart), at the cost
    * of one extra write+read of the touched buckets. Prefer true at fact
    * scale where a merge is expensive relative to the staging I/O. */
  def upsert(batch: DataFrame, path: String, pk: String, version: String,
      nBuckets: Int = 64, durableStage: Boolean = false): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = batch.sparkSession
    val dataCols = batch.columns.toIndexedSeq
    require(dataCols.contains(pk) && dataCols.contains(version),
      s"batch must carry pk '$pk' and version '$version', has ${dataCols.mkString(",")}")
    acquireLock(spark, path) // single-writer contract (object scaladoc)
    val b = try withBucket(batch, pk, nBuckets).persist()
    catch { case t: Throwable => releaseLock(spark, path); throw t }
    try {
      val touched = b.select(col(BucketCol)).distinct()
        .collect().map(_.getLong(0)).sorted
      val (exists, hasData) = {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val ex = fs.exists(p)
        // an existing dir with no visible data (empty first batch, or a
        // crash that left only _SUCCESS/staging) must merge as EMPTY:
        // spark.read.parquet on it throws schema-inference errors and
        // would brick every subsequent upsert on the path
        (ex, ex && fs.listStatus(p).exists { st =>
          (st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol=")) ||
            st.getPath.getName.endsWith(".parquet")
        })
      }
      pinLayout(spark, path, nBuckets, exists)
      val existing =
        if (!hasData) b.limit(0)
        else spark.read.parquet(path)
          // partition pruning: only the touched bucket= directories are
          // listed/read; column order normalized to the batch's
          .filter(col(BucketCol).isin(touched.toIndexedSeq: _*))
          .select((dataCols :+ BucketCol).map(col): _*)
      val w = Window.partitionBy(col(pk))
        .orderBy(col(version).desc, xxhash64(struct(dataCols.map(col): _*)).asc)
      val merged = b.select((dataCols :+ BucketCol).map(col): _*)
        .unionByName(existing)
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      // the write reads from the directories it overwrites — snapshot
      // first (see scaladoc for the durability tradeoff). Hidden
      // dot-prefixed staging is invisible to parquet directory reads and
      // untouched by the dynamic overwrite; a crashed attempt's stale
      // staging is simply overwritten by the retry.
      def overwrite(snap: DataFrame): Unit =
        snap.write
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .partitionBy(BucketCol)
          .parquet(path)
      if (durableStage) {
        val staging = new org.apache.hadoop.fs.Path(path, ".staging-merge")
        val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
        merged.write.mode("overwrite").parquet(staging.toString)
        overwrite(spark.read.parquet(staging.toString))
        fs.delete(staging, true)
        ()
      } else {
        val snap = merged.localCheckpoint(true)
        try overwrite(snap)
        finally { snap.unpersist(blocking = false); () }
      }
    } finally {
      b.unpersist(blocking = false)
      releaseLock(spark, path)
    }
  }

  /** The table's current rows (bucket column dropped — it is layout, not
    * data; pk hashing reconstructs it deterministically).
    *
    * Visibility contract: bucket directories are replaced by Spark's
    * dynamic-overwrite commit (per-directory rename). A reader concurrent
    * with an in-flight upsert may observe some buckets pre-merge and some
    * post-merge; a crashed upsert leaves affected buckets pre-merge and
    * the retry converges (the merge is a pure latest-wins function). Only
    * a transaction log gives cross-bucket atomicity — with Delta on the
    * cluster this read becomes a snapshot read of the MERGE target. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      throw new IllegalArgumentException(s"no bucketed table at $path")
    spark.read.parquet(path).drop(BucketCol)
  }

  /** Point lookup for one primary-key value: reconstructs the key's
    * bucket and reads ONLY that bucket directory (partition pruning on
    * the bucket column — the plan's scan lists one `bucket=<b>` dir, not
    * the table). This is the dim-lookup access pattern the reference
    * serves row-at-a-time (gmall-realtime-self/.../app/func/
    * DimHandler.java:25-63); here it is a pruned scan a driver-side
    * cache or broadcast can sit on top of.
    *
    * The bucket is computed with the SAME Spark expression the writes
    * use, evaluated in a one-row local job — no driver-side hash
    * reimplementation to drift from the executor's — and `nBuckets`
    * comes from the pinned layout marker, so a caller cannot probe with
    * the wrong modulus. */
  def readKey(spark: SparkSession, path: String, pk: String, value: Any): DataFrame = {
    require(value != null, "a NULL key has no bucket (NULL pks are rejected at upsert)")
    val n = pinnedBuckets(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no bucketed table layout at $path"))
    val b = spark.range(1)
      .select(pmod(xxhash64(lit(value).cast("string")), lit(n.toLong)).as("b"))
      .first().getLong(0)
    spark.read.parquet(path)
      .filter(col(BucketCol) === b && col(pk) === lit(value))
      .drop(BucketCol)
  }

  /** Streaming form: each micro-batch upserts into the bucketed table —
    * K3/K5 at fact scale (per-batch I/O proportional to touched buckets).
    * Idempotent under foreachBatch retries (see object scaladoc). */
  def sink(df: DataFrame, path: String, pk: String, version: String,
      nBuckets: Int = 64, durableStage: Boolean = false): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        upsert(batch.toDF(), path, pk, version, nBuckets, durableStage)
      }
}
