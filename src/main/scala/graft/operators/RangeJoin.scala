package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range joins — the non-equi join shapes Catalyst can only
  * plan as BroadcastNestedLoopJoin (or a cartesian product when neither
  * side broadcasts), which is O(|L|·|R|) work and a driver-killer at
  * scale. The classic fix (DBR's range-join hints, Flink's interval
  * join): quantize the range dimension into fixed-width buckets, turn
  * the theta join into a bucket EQUI-join both engines shuffle-hash on,
  * and re-check the exact predicate as a residual filter. Each side
  * shuffles ONCE on the bucket key; the candidate set is |pairs within
  * a bucket|, not |L|·|R|.
  *
  * Bucket width is 2^bucketBits, so the bucket id is one arithmetic
  * shift — exact floor division on longs, negative-safe (Long `/` in
  * Spark is double division; `>>` is the integer rule, same discipline
  * as Layout). Candidate generation is deterministic and the residual
  * filter restores EXACT theta-join semantics — the DuckDB oracles run
  * the plain theta join.
  *
  * Choosing bucketBits: width ~ the typical interval span. Too small →
  * wide per-interval explode fan-out (guarded by maxBucketsPerInterval);
  * too large → bucket-local candidate blowup. Either way results are
  * identical; only the shuffle/candidate volume moves.
  */
object RangeJoin {

  /** Bucket id: arithmetic shift = floor division by 2^bits, exact for
    * negatives too. */
  private[operators] def bucketOf(c: Column, bits: Int): Column =
    shiftright(c.cast("long"), bits)

  /** Buckets covered by [lo, hi], exploded — one row per (interval,
    * covering bucket). A malformed giant interval (span > maxBuckets
    * buckets) fails loudly instead of silently exploding the stage. */
  private def coveringBuckets(lo: Column, hi: Column, bits: Int,
                              maxBuckets: Int): Column = {
    val b0 = bucketOf(lo, bits)
    val b1 = bucketOf(hi, bits)
    explode(when(b1 - b0 < lit(maxBuckets.toLong), sequence(b0, b1))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: interval spans >= $maxBuckets buckets of width 2^$bits ["),
        lo, lit(", "), hi, lit("]")))))
  }

  /** Inner join of `points` (long column `v`) to `intervals` (long
    * columns `lo`, `hi`) on containment lo <= v <= hi, plus optional
    * equi-`keys` present on both sides. Each point maps to exactly one
    * bucket, so no pair is emitted twice. Column names must be disjoint
    * across the two frames (apart from `keys`); the output carries both
    * sides' columns, keys once. Intervals with lo > hi match nothing
    * (dropped up front, same as the theta join). */
  def pointInInterval(points: DataFrame, v: String,
                      intervals: DataFrame, lo: String, hi: String,
                      bucketBits: Int, keys: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketBits >= 0 && bucketBits < 63, s"bad bucketBits $bucketBits")
    val p = points.withColumn("__pb", bucketOf(col(v), bucketBits))
    val i = intervals.filter(col(lo) <= col(hi))
      .withColumn("__ib", coveringBuckets(col(lo), col(hi), bucketBits,
        maxBucketsPerInterval))
    val cond = (p("__pb") === i("__ib")) +: (
      keys.map(k => p(k) === i(k)) :+
      (p(v) >= i(lo)) :+ (p(v) <= i(hi)))
    val joined = p.join(i, cond.reduce(_ && _), "inner")
      .drop(i("__ib")).drop(p("__pb"))
    keys.map(i(_)).foldLeft(joined)(_ drop _)
  }

  /** Inner join of interval frames `a` and `b` on overlap
    * (aLo <= bHi AND bLo <= aHi), plus optional equi-`keys`. Both sides
    * explode to covering buckets; a pair shares every bucket the overlap
    * region touches, so it is emitted only in the CANONICAL bucket — the
    * one containing max(aLo, bLo), the overlap's left edge — keeping the
    * result duplicate-free without a distinct. */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      bucketBits: Int, keys: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketBits >= 0 && bucketBits < 63, s"bad bucketBits $bucketBits")
    val ae = a.filter(col(aLo) <= col(aHi))
      .withColumn("__ab", coveringBuckets(col(aLo), col(aHi), bucketBits,
        maxBucketsPerInterval))
    val be = b.filter(col(bLo) <= col(bHi))
      .withColumn("__bb", coveringBuckets(col(bLo), col(bHi), bucketBits,
        maxBucketsPerInterval))
    val canonical = ae("__ab") === bucketOf(greatest(ae(aLo), be(bLo)), bucketBits)
    val cond = (ae("__ab") === be("__bb")) +: (
      keys.map(k => ae(k) === be(k)) :+
      (ae(aLo) <= be(bHi)) :+ (be(bLo) <= ae(aHi)) :+ canonical)
    val joined = ae.join(be, cond.reduce(_ && _), "inner")
      .drop(ae("__ab")).drop(be("__bb"))
    keys.map(be(_)).foldLeft(joined)(_ drop _)
  }
}
