package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Driver-side reference interleave: bit b of dim d at position b*D+d. */
  private def refZ(vals: Seq[Long], bits: Int): Long =
    (for { b <- 0 until bits; (v, d) <- vals.zipWithIndex }
      yield ((v >> b) & 1L) << (b * vals.size + d)).sum

  test("zValue: hand-checked interleave and full 16x16 grid vs reference") {
    import spark.implicits._
    // x=5 (101), y=3 (011) at 3 bits: z = 1 + 2 + 8 + 16 = 27
    assert(refZ(Seq(5L, 3L), 3) === 27L)
    val got27 = spark.range(1)
      .select(Layout.zValue(Seq(lit(5L), lit(3L)), 3).as("z"))
      .first().getLong(0)
    assert(got27 === 27L)
    // every cell of a 16x16 grid matches the reference interleave
    val grid = (0 until 256).map(i => (i.toLong, (i % 16).toLong, (i / 16).toLong))
      .toDF("id", "x", "y")
    val got = grid.select(col("id"), Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0 until 256)
      assert(got(i.toLong) === refZ(Seq(i.toLong % 16, i.toLong / 16), 4), s"cell $i")
  }

  test("zorderFrame: bounds-derived buckets, locality beats single-column sort") {
    import spark.implicits._
    // 32x32 unit-stride grid, offset so the lo derivation is exercised
    // (unit stride + 5 bits = exact bucket resolution, so z is a bijection)
    val rows = for (x <- 0 until 32; y <- 0 until 32)
      yield (1000L + x, 500L + y)
    val df = rows.toDF("x", "y")
    val z = Layout.zorderFrame(df, Seq("x", "y"), bits = 5)
    // z is a bijection over the grid (distinct cells -> distinct keys at
    // exact bucket resolution)
    assert(z.select("z").distinct().count() === 1024L)
    // the data-skipping property: split each layout into 64-row runs
    // (files); a y-sorted layout's every run spans the FULL x range (min/
    // max stats can never prune on x), while z-order runs cover an 8x8
    // block — bounded extent in BOTH dimensions
    val ordered = z.orderBy(col("z")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def xExtent(run: Seq[(Long, Long)]): Long = {
      val xs = run.map(_._1); xs.max - xs.min + 1
    }
    val zRuns = ordered.grouped(64).map(_.toSeq).toSeq
    val yRuns = rows.sortBy(t => (t._2, t._1)).grouped(64).toSeq
    val zX = zRuns.map(xExtent).sum.toDouble / zRuns.size
    val yX = yRuns.map(xExtent).sum.toDouble / yRuns.size
    assert(yX === 32.0, s"y-sorted runs should span the full x range, got $yX")
    assert(zX * 2 < yX, s"z-run x-extent $zX not < half of y-sort's $yX")
  }

  test("writeClustered + prunedRead: zone-map pruning, equal to brute filter") {
    import spark.implicits._
    val path = SparkTestSession.scratch("layout") + "/t"
    // 32x32 unit-stride grid at 5 bits, 4 bucket bits -> 16 buckets of
    // 64 cells (8x8 blocks); one NULL-dim row exercises the default
    // partition path
    val rows = for (x <- 0 until 32; y <- 0 until 32)
      yield (Some(1000L + x), 500L + y)
    val df = (rows :+ (Option.empty[Long], 503L)).toDF("x", "y")
    Layout.writeClustered(df, Seq("x", "y"), path, bits = 5, bucketBits = 4)
    val table = spark.read.parquet(path)
    // one file per bucket + the default partition
    assert(table.inputFiles.length === 17, table.inputFiles.length)
    // zone map: 16 non-null buckets of 64 rows, each an 8x8 block
    val zm = Layout.zoneMapOf(table, Seq("x", "y"))
      .filter(col("zb").isNotNull).collect()
    assert(zm.length === 16)
    zm.foreach { r =>
      assert(r.getAs[Long]("ct") === 64L)
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") === 7L, r.toString)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") === 7L, r.toString)
    }
    // a block-aligned 8x8 range query: pruned result == brute filter
    val ranges = Seq(("x", 1008L, 1015L), ("y", 508L, 515L))
    val pruned = Layout.prunedRead(spark, path, ranges)
    // collect THIS frame (not a derived select) so the numFiles metric
    // below belongs to the executed plan
    val got = pruned.collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).sorted.toSeq
    val want = rows.collect {
      case (Some(x), y) if x >= 1008 && x <= 1015 && y >= 508 && y <= 515 => (x, y)
    }.sorted
    assert(got === want && got.size === 64)
    // and the bucket set reached the scan as a partition filter: only
    // the matching bucket dir + the default partition were read
    val plan = pruned.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters"), plan.toString)
    val scan = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value === 2L,
      s"read ${scan.metrics("numFiles").value} files, expected 2 (1 bucket + default)")
    // NULL-dim row surfaces when its queried dim matches
    val nullHit = Layout.prunedRead(spark, path, Seq(("y", 503L, 503L)))
    assert(nullHit.filter(col("x").isNull).count() === 1L)
  }

  test("prunedRead consults the PERSISTED zone map, not a re-aggregation") {
    import spark.implicits._
    val path = SparkTestSession.scratch("layout_zm") + "/t"
    val rows = for (x <- 0 until 32; y <- 0 until 32) yield (1000L + x, 500L + y)
    Layout.writeClustered(rows.toDF("x", "y"), Seq("x", "y"), path,
      bits = 5, bucketBits = 4)
    // the write emitted the sidecar index
    val zmDir = new java.io.File(Layout.zoneMapPath(path))
    assert(zmDir.isDirectory, "writeClustered must persist the zone map sidecar")
    val ranges = Seq(("x", 1008L, 1015L), ("y", 508L, 515L))
    assert(Layout.prunedRead(spark, path, ranges).count() === 64L)
    // doctor the sidecar: drop the overlapping bucket's row. If prunedRead
    // re-aggregated the table the result would be unchanged; reading the
    // doctored index must lose exactly that bucket (the residual keeps
    // nothing else in range).
    val doctored = spark.read.parquet(Layout.zoneMapPath(path))
      .filter(!(col("min_x") <= 1015L && col("max_x") >= 1008L &&
        col("min_y") <= 515L && col("max_y") >= 508L))
      .localCheckpoint(true) // materialize before overwriting its own source
    doctored.write.mode("overwrite").parquet(Layout.zoneMapPath(path))
    assert(Layout.prunedRead(spark, path, ranges).count() === 0L,
      "a doctored persisted index must drive the pruning — it was recomputed instead")
    // an explicit zoneMap argument still takes precedence over the sidecar
    val table = spark.read.parquet(path)
    assert(Layout.prunedRead(spark, path, ranges,
      Some(Layout.zoneMapOf(table, Seq("x", "y")))).count() === 64L)
    // rebuild == original (deterministic function of the data): restore
    Layout.zoneMapOf(table, Seq("x", "y"))
      .write.mode("overwrite").parquet(Layout.zoneMapPath(path))
    assert(Layout.prunedRead(spark, path, ranges).count() === 64L)
    // a rewrite refreshes the sidecar atomically-enough: stale index is
    // deleted before the data overwrite (missing -> fallback), new one
    // written after — re-cluster with different data and re-check
    val rows2 = for (x <- 0 until 16; y <- 0 until 16) yield (1000L + x, 500L + y)
    Layout.writeClustered(rows2.toDF("x", "y"), Seq("x", "y"), path,
      bits = 4, bucketBits = 4)
    assert(Layout.prunedRead(spark, path, Seq(("x", 1000L, 1003L), ("y", 500L, 503L)))
      .count() === 16L)
  }

  test("membership index: point lookup prunes to few buckets, persisted sidecar drives it") {
    import spark.implicits._
    val path = SparkTestSession.scratch("layout_bf") + "/t"
    // ids scattered over the grid: the x/y layout dims carry NO information
    // about id, so only the membership sketch can prune an id lookup
    val rows = for (x <- 0 until 32; y <- 0 until 32)
      yield (7919L * (x * 32 + y) % 50021, 1000L + x, 500L + y)
    Layout.writeClustered(rows.toDF("id", "x", "y"), Seq("x", "y"), path,
      bits = 5, bucketBits = 4)
    Layout.writeMembership(spark, path, "id", bits = 4096, k = 3)
    assert(new java.io.File(Layout.membershipPath(path, "id")).isDirectory)
    val probe = rows(517)._1
    val pruned = Layout.prunedPointRead(spark, path, "id", probe)
    val got = pruned.collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet
    val want = rows.collect { case (id, x, y) if id == probe => (x, y) }.toSet
    assert(got === want && got.nonEmpty)
    // pruning reached the scan: far fewer than the 16 bucket dirs read
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value < 8L,
      s"read ${scan.metrics("numFiles").value} files — membership pruning did not engage")
    // absent value: no bucket passes all three probes (w.h.p.), zero rows
    assert(Layout.prunedPointRead(spark, path, "id", 999999L).count() === 0L)
    // cross-type probe: an Int literal against the BIGINT column must hash
    // the COLUMN-typed rendering ("517", not via a mismatched string) —
    // the pruned read equals the unpruned filter for coercible literals
    assert(Layout.prunedPointRead(spark, path, "id", probe.toInt)
      .count() === want.size.toLong)
    // the persisted sidecar drives the lookup: a doctored index that
    // drops every bucket must lose the rows (a rebuild would not)
    val doctored = spark.read.parquet(Layout.membershipPath(path, "id"))
      .withColumn("positions", array().cast("array<bigint>"))
      .localCheckpoint(true) // keep rows + pinned geometry, empty the sets
    doctored.write.mode("overwrite").parquet(Layout.membershipPath(path, "id"))
    assert(Layout.prunedPointRead(spark, path, "id", probe).count() === 0L,
      "doctored persisted index must drive pruning — it was recomputed instead")
    Layout.writeMembership(spark, path, "id", bits = 4096, k = 3) // restore
    assert(Layout.prunedPointRead(spark, path, "id", probe).count() === want.size.toLong)
    // re-clustering deletes stale membership sidecars (missing -> the
    // caller rebuilds or lookups fall back to on-the-fly indexes)
    Layout.writeClustered(rows.take(64).toDF("id", "x", "y"), Seq("x", "y"), path,
      bits = 4, bucketBits = 4)
    assert(!new java.io.File(Layout.membershipPath(path, "id")).exists(),
      "stale membership sidecar survived a re-cluster")
    assert(Layout.prunedPointRead(spark, path, "id", rows(10)._1).count() === 1L)
  }

  test("compactFiles: many small files -> sized copy, content identical, met-target no-op") {
    import spark.implicits._
    val in = "/tmp/graft_test_compact_in"
    val out = "/tmp/graft_test_compact_out"
    for (p <- Seq(in, out))
      new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    val df = (0L until 2000L).map(i => (i, s"row $i payload ${i % 17}")).toDF("id", "v")
    df.repartition(40).write.parquet(in)
    val nIn = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nIn === 40)
    // huge target -> everything fits in one file
    val (b, a) = graft.operators.Layout.compactFiles(spark, in, out, targetBytes = 1L << 30)
    assert(b === 40 && a === 1)
    val got = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === want) // byte-for-byte content survives the rewrite
    // the original is untouched (out-of-place contract)
    assert(new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet")) === 40)
    // already-compacted dir: met-target no-op, nothing written
    val out2 = "/tmp/graft_test_compact_out2"
    new scala.reflect.io.Directory(new java.io.File(out2)).deleteRecursively()
    val (b2, a2) = graft.operators.Layout.compactFiles(spark, out, out2, targetBytes = 1L << 30)
    assert(b2 === 1 && a2 === 1)
    assert(!new java.io.File(out2).exists())
    // in-place compaction is refused LOUDLY: the overwrite would delete
    // the directory being lazily read
    val e = intercept[IllegalArgumentException] {
      graft.operators.Layout.compactFiles(spark, out, out, targetBytes = 1L)
    }
    assert(e.getMessage.contains("disjoint"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Layout.compactFiles(spark, out, out + "/nested", targetBytes = 1L)
    }
    assert(e2.getMessage.contains("disjoint"))
  }

  test("NULL dims and empty frames are safe") {
    import spark.implicits._
    val withNull = Seq((Some(1L), 2L), (None, 3L)).toDF("x", "y")
    val z = Layout.zorderFrame(withNull, Seq("x", "y"), bits = 4).collect()
    assert(z.count(_.isNullAt(2)) === 1) // NULL dim -> NULL key, not a crash
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(Layout.zorderFrame(empty, Seq("x", "y")).count() === 0)
  }
}
