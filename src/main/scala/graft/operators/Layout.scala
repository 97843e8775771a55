package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional file-layout clustering: Morton (Z-order) keys —
  * the `OPTIMIZE ZORDER BY` analog for plain parquet tables (Morton
  * 1966; the standard space-filling-curve layout every lakehouse engine
  * uses for multi-column data skipping).
  *
  * Why it matters at 100 TB: min/max row-group statistics prune a scan
  * only when the file layout CLUSTERS the filtered columns. Sorting by
  * one column gives perfect pruning on it and none on the others;
  * sorting by the interleaved Morton key gives every dimension locality
  * proportional to its bit share, so a two-column predicate prunes on
  * both. The engine-side recipe: `zorderFrame(df, dims)` →
  * `repartitionByRange(n, col("z"))` (+ sortWithinPartitions("z")) →
  * write; readers then prune files/row-groups on any dim's min/max.
  *
  * Everything here is exact integer arithmetic — power-of-two bucket
  * widths via shifts, bit interleave via shift/mask/add — so the key is
  * bit-identical across engines and oracle-checkable (no doubles, no
  * rounding modes).
  */
object Layout {

  /** Morton interleave of pre-bucketed dimension values: bit b of
    * dimension d lands at position b·D + d. Dims must already be in
    * [0, 2^bits); D·bits <= 63 keeps the key in a signed long. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    require(bits > 0 && dims.size * bits <= 63,
      s"dims*bits must fit a signed long, got ${dims.size}*$bits")
    val d = dims.size
    val terms = for {
      b <- 0 until bits
      (dim, di) <- dims.zipWithIndex
    } yield shiftleft(shiftright(dim, b).bitwiseAND(lit(1L)), b * d + di)
    terms.reduce(_ + _)
  }

  /** Smallest shift making (hi - lo) >> shift fit `bits` bits — the
    * power-of-two bucket width for [lo, hi]. Integer-only (no log2
    * floats whose rounding could flip at exact powers of two); the
    * oracle derives the same shift with the same integer rule. */
  def bucketShift(lo: Long, hi: Long, bits: Int): Int = {
    require(hi >= lo, s"empty range [$lo, $hi]")
    val range = hi - lo
    var s = 0
    while ((range >> s) >= (1L << bits)) s += 1
    s
  }

  /** Monotone power-of-two bucketing to [0, 2^bits): order-preserving
    * per dimension (a hash bucket would destroy the range locality the
    * curve exists for). */
  def bucketize(c: Column, lo: Long, shift: Int): Column =
    shiftright(c.cast("long") - lit(lo), shift)

  /** The frame plus a Morton key `z` over the named integer dimensions:
    * one driver-tiny min/max agg fixes each dimension's bounds, then the
    * key is a single map-side projection. Sort/range-partition by `z`
    * before writing to get multi-column clustering. NULL dims: a NULL
    * value yields a NULL z (the row sorts last in the layout — document
    * rather than invent an ordering for missing keys). */
  def zorderFrame(df: DataFrame, dims: Seq[String], bits: Int = 16): DataFrame = {
    require(dims.nonEmpty, "zorderFrame needs at least one dimension")
    val aggs = dims.flatMap(d =>
      Seq(min(col(d).cast("long")).as(s"__lo_$d"), max(col(d).cast("long")).as(s"__hi_$d")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).first()
    val cols = dims.zipWithIndex.map { case (dname, i) =>
      // empty frame / all-NULL dim: bounds are NULL — fall back to [0,0]
      // (no non-null value exists to bucket; NULL rows keep z NULL)
      val lo = if (bounds.isNullAt(2 * i)) 0L else bounds.getLong(2 * i)
      val hi = if (bounds.isNullAt(2 * i + 1)) 0L else bounds.getLong(2 * i + 1)
      bucketize(col(dname), lo, bucketShift(lo, hi, bits))
    }
    df.withColumn("z", zValue(cols, bits))
  }

  /** Coarse clustering bucket: the top `bucketBits` bits of a
    * D-dim × `bits` Morton key — at most 2^bucketBits buckets, each a
    * contiguous hypercube run of the curve. A pure function of z (no
    * sampled range bounds, no frozen layout), so the zone map below is
    * an ordinary SQL view of the data and two passes always agree. */
  def zBucket(z: Column, nDims: Int, bits: Int, bucketBits: Int): Column = {
    require(bucketBits > 0 && bucketBits <= nDims * bits,
      s"bucketBits must be in (0, ${nDims * bits}], got $bucketBits")
    shiftright(z, nDims * bits - bucketBits)
  }

  /** Sidecar directory holding the persisted zone map of a clustered
    * table (dot-prefixed sibling — invisible to parquet directory reads
    * of the table itself). */
  def zoneMapPath(path: String): String = path + "._graft_zonemap"

  /** Write `df` clustered for multi-column data skipping: Morton key →
    * coarse `zb=<bucket>/` directories, rows z-sorted within each file.
    * One shuffle hash-keyed by zb (each bucket lands in one task → one
    * file per bucket); a NULL dimension yields zb NULL (hive default
    * partition — never pruned away, so NULL-dim rows stay reachable).
    * Readers prune whole directories with `prunedRead` (zone-map
    * overlap + partition filters) and parquet row-group min/max stats
    * prune inside each file thanks to the z sort.
    *
    * The per-bucket zone map is PERSISTED next to the data
    * ([[zoneMapPath]]) so readers prune without re-aggregating the
    * table: built from a column-pruned scan of the freshly-written
    * files (reads only the layout dims + the partition column — cheap
    * next to the write), which also certifies the index describes what
    * actually LANDED. Crash ordering: the stale sidecar is deleted
    * BEFORE the data overwrite, so a crash anywhere in the window
    * leaves no sidecar and readers fall back to recomputation — a stale
    * index can never describe new data. */
  def writeClustered(df: DataFrame, dims: Seq[String], path: String,
                     bits: Int = 8, bucketBits: Int = 6): Unit = {
    val spark = df.sparkSession
    val zm = new org.apache.hadoop.fs.Path(zoneMapPath(path))
    val fs = zm.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(zm, true) // stale index must not outlive the old data
    // same rule for any membership sidecars of the previous contents
    // (globStatus returns null when the parent does not exist yet)
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(path + "._graft_member_*")))
      .getOrElse(Array.empty)
      .foreach(st => fs.delete(st.getPath, true))
    zorderFrame(df, dims, bits)
      .withColumn("zb", zBucket(col("z"), dims.size, bits, bucketBits))
      .repartition(col("zb"))
      .sortWithinPartitions("zb", "z")
      .write.partitionBy("zb").mode("overwrite").parquet(path)
    zoneMapOf(spark.read.parquet(path), dims)
      .write.mode("overwrite").parquet(zoneMapPath(path))
  }

  /** The persisted zone map written by [[writeClustered]], if present. */
  def persistedZoneMap(spark: SparkSession, path: String): Option[DataFrame] = {
    val zm = new org.apache.hadoop.fs.Path(zoneMapPath(path))
    val fs = zm.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(zm)) Some(spark.read.parquet(zoneMapPath(path))) else None
  }

  /** Per-bucket zone map (count + each dim's min/max) — the file-skipping
    * index for a clustered table. Bounded at 2^bucketBits rows.
    * [[writeClustered]] persists this frame alongside the table (it is a
    * deterministic function of the data, so rebuild == original);
    * aggregating the table directly remains the rebuild / fallback
    * path. */
  def zoneMapOf(table: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = count(lit(1L)).as("ct") +:
      dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d")))
    table.groupBy(col("zb")).agg(aggs.head, aggs.tail: _*)
  }

  /** Range query over a clustered table touching only buckets whose zone
    * map overlaps the predicate: the driver-tiny (≤ 2^bucketBits rows)
    * zone map resolves the bucket set, `zb IN (...)` reaches the scan as
    * a partition filter (whole directories skipped), and the residual
    * per-dim predicate drops the bucket-boundary rows. Equal to the
    * unpruned filter by construction — the zone map is exact.
    *
    * Zone-map source, in order: the caller's `zoneMap` frame, the
    * PERSISTED sidecar writeClustered emitted (no table re-aggregation —
    * the 100 TB path), else an on-the-fly rebuild (pre-sidecar tables). */
  def prunedRead(spark: SparkSession, path: String,
                 ranges: Seq[(String, Long, Long)],
                 zoneMap: Option[DataFrame] = None): DataFrame = {
    require(ranges.nonEmpty, "prunedRead needs at least one range")
    val table = spark.read.parquet(path)
    val overlap = ranges.map { case (d, lo, hi) =>
      col(s"min_$d") <= lit(hi) && col(s"max_$d") >= lit(lo)
    }.reduce(_ && _)
    val buckets = zoneMap.orElse(persistedZoneMap(spark, path))
      .getOrElse(zoneMapOf(table, ranges.map(_._1)))
      .filter(overlap && col("zb").isNotNull) // NULL partition unioned below
      .select(col("zb").cast("long"))
      .collect().map(_.getLong(0)) // driver-tiny: one row per bucket
    val residual = ranges.map { case (d, lo, hi) =>
      col(d) >= lit(lo) && col(d) <= lit(hi)
    }.reduce(_ && _)
    // NULL-dim rows live in the hive default partition (zb NULL) outside
    // every zone-map range — scan that one partition too so a row whose
    // QUERIED dims are set still surfaces when some OTHER layout dim was
    // NULL. Both disjuncts are partition filters; the pruning stands.
    table.filter((col("zb").isInCollection(buckets) || col("zb").isNull) && residual)
  }

  /** Sidecar directory holding the persisted membership index of one
    * column of a clustered table. */
  def membershipPath(path: String, column: String): String =
    path + "._graft_member_" + column

  /** The k probe positions of a value in a `bits`-wide membership
    * sketch: md5-prefix32("bf<i>:" + value) mod bits — the engine-parity
    * hash family (the DuckDB oracle recomposes identical positions), one
    * Spark expression shared by index build and point lookup (no
    * driver-side hash reimplementation to drift — the readKey rule). */
  def membershipProbes(c: Column, bits: Int, k: Int): Seq[Column] = {
    require(bits > 0 && k > 0, s"bits/k must be positive, got $bits/$k")
    (0 until k).map(i =>
      pmod(graft.functions.TextFunctions.hash32(
        concat(lit(s"bf$i:"), c.cast("string"))), lit(bits.toLong)))
  }

  /** Per-bucket membership sketch over a HIGH-CARDINALITY column — the
    * bloom-filter-index complement to the zone map: zone maps prune RANGE
    * queries on the layout dimensions, this prunes POINT lookups on a
    * column whose values scatter across buckets (ids, urls, hashes). Per
    * zb bucket, the sorted distinct set of probe positions its values
    * set ([[membershipProbes]] — k positions per value in a `bits`-wide
    * space). A lookup keeps only buckets containing ALL k of the probe
    * positions of the searched value: false positives cost an extra
    * bucket scan, false negatives are IMPOSSIBLE (a present value set
    * all its positions), so the pruned read equals the unpruned filter
    * by construction — same exactness contract as the zone map.
    *
    * Scale: one column-pruned scan, k-fold explode, one zb-keyed
    * partial-agged collect_set bounded by `bits` entries per bucket —
    * the index is ≤ 2^bucketBits × bits positions regardless of table
    * size. NULL values set no positions (a NULL lookup is rejected —
    * point lookups need an addressable value). */
  def membershipMapOf(table: DataFrame, column: String,
      bits: Int = 4096, k: Int = 3): DataFrame =
    table.filter(col(column).isNotNull)
      .select(col("zb"),
        explode(array(membershipProbes(col(column), bits, k): _*)).as("pos"))
      .groupBy(col("zb"))
      .agg(array_sort(collect_set(col("pos"))).as("positions"))
      .select(col("zb"), size(col("positions")).cast("long").as("n_positions"),
        col("positions"))

  /** Build and persist the membership index of `column` from the written
    * clustered table (column-pruned scan: reads only `column` + the
    * partition column). `bits`/`k` are pinned INSIDE the sidecar so a
    * lookup can never probe with a mismatched geometry. */
  def writeMembership(spark: SparkSession, path: String, column: String,
      bits: Int = 4096, k: Int = 3): Unit =
    membershipMapOf(spark.read.parquet(path), column, bits, k)
      .withColumn("bits", lit(bits)).withColumn("k", lit(k))
      .write.mode("overwrite").parquet(membershipPath(path, column))

  /** The persisted membership index of `column`, if present, with its
    * pinned (bits, k) geometry. */
  def persistedMembership(spark: SparkSession, path: String,
      column: String): Option[(DataFrame, Int, Int)] = {
    val mp = new org.apache.hadoop.fs.Path(membershipPath(path, column))
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mp)) None
    else {
      val idx = spark.read.parquet(membershipPath(path, column))
      val geo = idx.select(col("bits"), col("k")).distinct().collect()
      require(geo.length == 1,
        s"membership index at ${membershipPath(path, column)} has mixed geometry")
      Some((idx, geo(0).getInt(0), geo(0).getInt(1)))
    }
  }

  /** Point lookup over a clustered table touching only buckets whose
    * membership sketch can contain the value (+ the hive default
    * partition for NULL-dim rows): the ≤ 2^bucketBits-row index resolves
    * the bucket set, `zb IN (...)` reaches the scan as a partition
    * filter, the exact equality predicate finishes. Equal to the
    * unpruned filter by construction (no false negatives — see
    * [[membershipMapOf]]). Index source: explicit `index` frame, the
    * persisted sidecar (whose pinned geometry OVERRIDES the bits/k
    * arguments), else an on-the-fly rebuild with the given geometry. */
  def prunedPointRead(spark: SparkSession, path: String, column: String,
      value: Any, bits: Int = 4096, k: Int = 3,
      index: Option[DataFrame] = None): DataFrame = {
    require(value != null, "a NULL value has no membership probes")
    val table = spark.read.parquet(path)
    val (idx, useBits, useK) = index.map((_, bits, k))
      .orElse(persistedMembership(spark, path, column))
      .getOrElse((membershipMapOf(table, column, bits, k), bits, k))
    // the value's probe positions via the SAME Spark expression the
    // index build used, evaluated in a one-row local job. The probe
    // value is cast to the COLUMN's type first: the index hashed
    // cast(col AS STRING) of column-typed values, so probing a double
    // column with the int 5 must hash "5.0", not "5" — a raw-literal
    // probe silently returns zero rows where the unpruned filter matches
    val dt = table.schema(column).dataType
    val ps = spark.range(1)
      .select(array(membershipProbes(lit(value).cast(dt), useBits, useK): _*).as("ps"))
      .first().getSeq[Long](0)
    val buckets = idx
      .filter(ps.map(p => array_contains(col("positions"), lit(p))).reduce(_ && _))
      .filter(col("zb").isNotNull)
      .select(col("zb").cast("long"))
      .collect().map(_.getLong(0)) // driver-tiny: one row per bucket
    table.filter((col("zb").isInCollection(buckets.toIndexedSeq) || col("zb").isNull) &&
      col(column) === lit(value))
  }

  /** Small-file compaction for a flat parquet directory — the other
    * unbounded-growth housekeeping next to the streaming registry fold:
    * continuous ingestion leaves thousands of kilobyte files whose
    * per-file open/footer cost eventually dominates scans. Writes a
    * compacted COPY of `inPath` to `outPath` with
    * ceil(totalBytes / targetBytes) files; the switch is the caller's
    * directory rename (one FS rename — atomic on HDFS-compatible
    * filesystems), so a crash at ANY point leaves the original
    * untouched and a retry simply overwrites the copy. Deliberately not
    * an in-place rewrite: every in-place protocol has either a data-
    * absent window or a retry-duplication window; the copy + atomic
    * swap has neither, at the cost of transient 2× storage for the one
    * directory (the same trade the registry fold's snapshot makes).
    *
    * Returns (filesBefore, filesAfter). When the directory already meets
    * the target count nothing is written and (n, n) is returned. */
  def compactFiles(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val base = new org.apache.hadoop.fs.Path(inPath)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val qIn = fs.makeQualified(base)
    val qOut = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    // the overwrite deletes outPath at job start: pointing it at (or
    // inside) the source would destroy the data being lazily read — the
    // exact in-place hazard the copy design exists to avoid
    require(qIn != qOut && !qOut.toString.startsWith(qIn.toString + "/") &&
      !qIn.toString.startsWith(qOut.toString + "/"),
      s"compactFiles: outPath ($qOut) must be disjoint from inPath ($qIn)")
    val before = fs.listStatus(base).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val totalBytes = before.map(_.getLen).sum
    val want = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (before.size <= want) return (before.size, before.size)
    spark.read.parquet(inPath).repartition(want)
      .write.mode("overwrite").parquet(outPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath)).toSeq
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (before.size, after)
  }
}
