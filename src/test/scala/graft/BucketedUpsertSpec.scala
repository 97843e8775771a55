package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.BucketedUpsert

class BucketedUpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshPath(tag: String): String =
    SparkTestSession.scratch(s"bu_$tag") + "/t"

  private def bucketDirs(path: String): Map[String, Seq[(String, Long, Long)]] = {
    val base = new java.io.File(path)
    base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .map(f => (f.getName, f.length(), f.lastModified())).sortBy(_._1))
      .toMap
  }

  test("latest row per key wins across waves; re-applying a wave is a no-op") {
    import spark.implicits._
    val path = freshPath("waves")
    val w1 = (1L to 100L).map(k => (k, s"a$k", 1L)).toDF("k", "v", "version")
    val w2 = (1L to 100L).filter(_ % 4 == 0).map(k => (k, s"b$k", 2L)).toDF("k", "v", "version")
    BucketedUpsert.upsert(w1, path, "k", "version", nBuckets = 8)
    BucketedUpsert.upsert(w2, path, "k", "version", nBuckets = 8)
    def state() = BucketedUpsert.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = state()
    val want = (1L to 100L).map(k =>
      if (k % 4 == 0) (k, s"b$k", 2L) else (k, s"a$k", 1L)).toSet
    assert(got === want)
    // retry contract: re-applying wave 2 converges to the same rows
    BucketedUpsert.upsert(w2, path, "k", "version", nBuckets = 8)
    assert(state() === want)
    // stale version loses: an out-of-order replay of wave 1 changes nothing
    BucketedUpsert.upsert(w1.filter($"k" % 4 === 0), path, "k", "version", nBuckets = 8)
    assert(state() === want)
  }

  test("only touched bucket directories are rewritten") {
    import spark.implicits._
    val path = freshPath("touch")
    val w1 = (1L to 200L).map(k => (k, s"a$k", 1L)).toDF("k", "v", "version")
    BucketedUpsert.upsert(w1, path, "k", "version", nBuckets = 8)
    val before = bucketDirs(path)
    assert(before.size === 8, s"expected all 8 buckets populated, got ${before.keySet}")
    // a single-key wave touches exactly one bucket
    val w2 = Seq((7L, "B7", 2L)).toDF("k", "v", "version")
    Thread.sleep(1100) // mtime granularity guard
    BucketedUpsert.upsert(w2, path, "k", "version", nBuckets = 8)
    val after = bucketDirs(path)
    val changed = after.keySet.filter(b => before.get(b) != after.get(b))
    assert(changed.size === 1, s"expected 1 rewritten bucket, got $changed")
    // and the data is correct
    val got = BucketedUpsert.read(spark, path)
      .filter($"k" === 7L).collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("B7", 2L)))
  }

  test("layout is pinned: an upsert with a different nBuckets is rejected") {
    import spark.implicits._
    val path = freshPath("layout")
    val w1 = (1L to 20L).map(k => (k, s"a$k", 1L)).toDF("k", "v", "version")
    BucketedUpsert.upsert(w1, path, "k", "version", nBuckets = 8)
    // the default (64) differs from the pinned layout — must fail loudly
    // instead of silently duplicating keys across incompatible bucket dirs
    val e = intercept[IllegalArgumentException] {
      BucketedUpsert.upsert(w1, path, "k", "version")
    }
    assert(e.getMessage.contains("nBuckets=8"), e.getMessage)
    // the matching layout still works after the rejected attempt
    BucketedUpsert.upsert(Seq((1L, "b1", 2L)).toDF("k", "v", "version"),
      path, "k", "version", nBuckets = 8)
    assert(BucketedUpsert.read(spark, path).filter($"k" === 1L)
      .collect().map(_.getString(1)).toSeq === Seq("b1"))
  }

  test("durableStage snapshot: identical table, staging dir cleaned up") {
    import spark.implicits._
    val pathA = freshPath("durable")
    val pathB = freshPath("localck")
    val w1 = (1L to 100L).map(k => (k, s"a$k", 1L)).toDF("k", "v", "version")
    val w2 = (1L to 100L).filter(_ % 3 == 0).map(k => (k, s"b$k", 2L)).toDF("k", "v", "version")
    for (w <- Seq(w1, w2)) {
      BucketedUpsert.upsert(w, pathA, "k", "version", nBuckets = 8, durableStage = true)
      BucketedUpsert.upsert(w, pathB, "k", "version", nBuckets = 8)
    }
    def rd(p: String) = BucketedUpsert.read(spark, p)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rd(pathA) === rd(pathB))
    // staging is transient: deleted after the overwrite commits
    assert(!new java.io.File(pathA, ".staging-merge").exists())
  }

  test("NULL primary key fails loudly instead of collapsing to one row") {
    import spark.implicits._
    val path = freshPath("nullpk")
    val bad = Seq((Some(1L), "a", 1L), (None, "b", 1L), (None, "c", 2L))
      .toDF("k", "v", "version")
    // raise_error surfaces as SparkRuntimeException (USER_RAISED_EXCEPTION),
    // possibly wrapped in a task-failure SparkException
    val e = intercept[Exception] {
      BucketedUpsert.upsert(bad, path, "k", "version", nBuckets = 4)
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("NULL primary key"), s"unexpected failure: $msgs")
  }

  test("writer lock: a held lock fails the second writer loudly; breakLock recovers") {
    import spark.implicits._
    val path = freshPath("lock")
    val w1 = (1L to 20L).map(k => (k, s"a$k", 1L)).toDF("k", "v", "version")
    BucketedUpsert.upsert(w1, path, "k", "version", nBuckets = 4)
    // a successful upsert releases its lock
    assert(!new java.io.File(path + "._graft_writer_lock").exists(),
      "lock must be released after a successful upsert")
    // simulate a concurrent/crashed writer holding the lock
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + "._graft_writer_lock"),
      "pid=9999 acquired=2026-01-01T00:00:00Z".getBytes("UTF-8"))
    val w2 = Seq((1L, "b1", 2L)).toDF("k", "v", "version")
    val e = intercept[IllegalStateException] {
      BucketedUpsert.upsert(w2, path, "k", "version", nBuckets = 4)
    }
    assert(e.getMessage.contains("writer lock held") && e.getMessage.contains("pid=9999"),
      s"must name the holder: ${e.getMessage}")
    // the failed attempt must NOT have removed someone else's lock
    assert(new java.io.File(path + "._graft_writer_lock").exists())
    // and must not have changed the table
    assert(BucketedUpsert.read(spark, path).filter(col("k") === 1L)
      .collect().map(_.getString(1)).toSeq === Seq("a1"))
    // operator override, then the upsert proceeds and re-releases
    assert(BucketedUpsert.breakLock(spark, path))
    BucketedUpsert.upsert(w2, path, "k", "version", nBuckets = 4)
    assert(BucketedUpsert.read(spark, path).filter(col("k") === 1L)
      .collect().map(_.getString(1)).toSeq === Seq("b1"))
    assert(!new java.io.File(path + "._graft_writer_lock").exists())
  }

  test("writer lock: released even when the upsert itself fails (NULL pk)") {
    import spark.implicits._
    val path = freshPath("lockfail")
    val bad = Seq((Some(1L), "a", 1L), (None, "b", 1L)).toDF("k", "v", "version")
    intercept[Exception] {
      BucketedUpsert.upsert(bad, path, "k", "version", nBuckets = 4)
    }
    assert(!new java.io.File(path + "._graft_writer_lock").exists(),
      "a failed upsert in a live JVM must release the lock for the retry")
    // the retry (nulls filtered) succeeds without manual intervention
    BucketedUpsert.upsert(bad.filter(col("k").isNotNull), path, "k", "version", nBuckets = 4)
    assert(BucketedUpsert.read(spark, path).count() === 1L)
  }

  test("readKey scans exactly one bucket directory (partition pruning)") {
    import spark.implicits._
    val path = freshPath("lookup")
    val w1 = (1L to 200L).map(k => (k, s"a$k", 1L)).toDF("k", "v", "version")
    BucketedUpsert.upsert(w1, path, "k", "version", nBuckets = 8)
    val lookup = BucketedUpsert.readKey(spark, path, "k", 7L)
    // correctness: exactly the requested row
    assert(lookup.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((7L, "a7")))
    // pruning: the bucket equality reaches the scan as a PARTITION filter
    // (inputFiles would lie here — it lists pre-pruning), and the
    // post-execution numFiles metric proves exactly one of the 8 bucket
    // dirs' files was read
    val plan = lookup.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters") &&
      plan.toString.contains("bucket"), plan.toString)
    val scan = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value === 1L,
      s"read ${scan.metrics("numFiles").value} files, expected 1")
    // a missing key resolves to its (single) bucket and returns no rows
    assert(BucketedUpsert.readKey(spark, path, "k", 100000L).count() === 0L)
    // no layout marker => loud failure, not a guessed modulus
    intercept[IllegalArgumentException] {
      BucketedUpsert.readKey(spark, freshPath("nolayout"), "k", 1L)
    }
  }

  test("streaming sink: micro-batched upserts == one batch upsert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val streamPath = freshPath("stream")
    val batchPath = freshPath("streambatch")
    val rows = (1L to 60L).map(k => (k, s"v${k % 7}", k % 5))
    val stream = MemoryStream[(Long, String, Long)]
    val q = BucketedUpsert.sink(
      stream.toDF().toDF("k", "v", "version"), streamPath, "k", "version", nBuckets = 4)
      .start()
    val (h1, h2) = rows.splitAt(30)
    stream.addData(h1); q.processAllAvailable()
    stream.addData(h2); q.processAllAvailable()
    q.stop()
    BucketedUpsert.upsert(rows.toDF("k", "v", "version"), batchPath, "k", "version", nBuckets = 4)
    def rd(p: String) = BucketedUpsert.read(spark, p)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rd(streamPath) === rd(batchPath))
  }
}
