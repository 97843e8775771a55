package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** Count-min sketch — the mergeable frequency sketch (Cormode &
  * Muthukrishnan, J. Algorithms 2005) for corpus-scale counting where the
  * key space (n-grams, URLs, fingerprints) is too large to keep exactly:
  * `depth` independent hash rows × `width` counters; every observation
  * increments one counter per row; an estimate is the MIN over its row
  * counters — always ≥ the true count (only collisions inflate, nothing
  * decrements), within εN with probability 1−δ for width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉.
  *
  * Engine-parity determinism (the repo's sketch rule, same as the gated
  * HLL): row hashes are md5-prefix buckets of `"cm<r>:" + key` — no RNG,
  * no partition-order dependence — so DuckDB rebuilds the identical
  * counter table and the oracle certifies counters, estimates, and the
  * heavy-hitter cut bit-for-bit.
  *
  * Scale: the counter table is depth·width rows — model-sized state built
  * by ONE partial-agged aggregation over the observation stream (each
  * observation contributes `depth` (row, bucket) increments — a bounded
  * ×depth explode, map-side before the agg). Estimation joins candidate
  * keys against the tiny counter table (AQE broadcasts it) and takes one
  * min per key. Sketches from disjoint corpus shards merge by summing
  * counters — the property that makes this the streaming/incremental
  * counter (a registry analog: fold batch sketches by element-wise sum).
  * NULL keys are excluded (no identity to count).
  */
object Sketches {

  private def rowBucket(key: Column, r: Int, width: Int): Column =
    pmod(hash32(concat(lit(s"cm$r:"), key.cast("string"))), lit(width.toLong))

  /** Build the depth×width counter table from an observation stream (one
    * row per observation). Returns (r, bucket, c) — only touched cells;
    * absent cells are zero. */
  def countMinCounters(obs: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape $depth x $width")
    val keyed = obs.select(key.cast("string").as("__k")).filter(col("__k").isNotNull)
    keyed
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), rowBucket(col("__k"), r, width).as("bucket"))): _*))
        .as("cell"))
      .select(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `keys` (one row per DISTINCT key wanted) against
    * a counter table: est = min over rows of the key's counter (0 if a
    * row's cell was never touched). Always ≥ the true count. */
  def countMinEstimate(keys: DataFrame, key: Column, counters: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val keyed = keys.select(key.cast("string").as("k")).filter(col("k").isNotNull).distinct()
    keyed
      .select(col("k"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), rowBucket(col("k"), r, width).as("bucket"))): _*))
        .as("cell"))
      .select(col("k"), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .join(broadcast(counters), Seq("r", "bucket"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Heavy hitters: every distinct key whose count-min estimate reaches
    * `minCount`. Sound (no false negatives — est ≥ true, so every truly
    * heavy key survives); collisions may admit a light key, the
    * documented CMS trade. One sketch build + one estimation pass. */
  def heavyHitters(obs: DataFrame, key: Column, minCount: Long,
      depth: Int = 4, width: Int = 512): DataFrame = {
    // the observation stream feeds BOTH the sketch build and the
    // estimation pass — persist it once (cache registry, Dedup contract)
    val keyed = Dedup.track(obs
      .select(key.cast("string").as("__hhk")).filter(col("__hhk").isNotNull)
      .persist())
    val counters = countMinCounters(keyed, col("__hhk"), depth, width)
    countMinEstimate(keyed, col("__hhk"), counters, depth, width)
      .filter(col("est") >= minCount)
  }
}
