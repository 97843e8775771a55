package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed count-anomaly detection over an event stream — the traffic
  * alarm of a real-time warehouse (cf. the reference's windowed traffic
  * aggregates, `Dws...TrafficApp`): bucket timestamps, count per
  * (key, bucket), and flag buckets whose count deviates from the key's
  * OWN bucket-count distribution by more than k standard deviations.
  *
  * Exact integer z-test: |c − μ| > kσ cross-multiplies (μ = S/n,
  * σ² = Q/n − S²/n², S = Σc, Q = Σc²) to
  * `(n·c − S)² > k²·(n·Q − S²)` — no division, no sqrt, no floats
  * anywhere, so both engines compute the identical flag. Intermediates
  * run in DECIMAL(38,0) (DuckDB: HUGEINT): n·Q alone passes BIGINT at
  * ~10^5 daily buckets of ~10^12 events, far under the 100 TB posture.
  *
  * Scale: ONE (key, bucket)-keyed count agg over the events (map-side
  * combined — the only corpus-sized work), then per-key stats over the
  * BUCKET COUNTS (bucket-count-sized) broadcast back onto them. A
  * missing bucket is absent, not zero: silence anomalies (a feed going
  * dark) need bucket densification upstream, not a z-test on rows that
  * don't exist — deliberate, documented contract. */
object Anomaly {

  /** Per-(key, bucket) counts with the anomaly verdict:
    * (key, bucket, c, direction ∈ {-1,0,1}, is_anomaly). `granularity`
    * is any `date_trunc` unit (day, hour, week, …); a key with a single
    * bucket is never anomalous (n=1 makes both sides 0). */
  /** date_trunc units this module accepts: Spark silently returns NULL
    * for an unknown unit (every row collapses to one n=1 bucket and the
    * alarm goes quiet with no error), so the typo must fail here. */
  private val Granularities =
    Set("year", "quarter", "month", "week", "day", "hour", "minute", "second")
  private def requireGranularity(g: String): Unit =
    require(Granularities.contains(g.toLowerCase),
      s"unknown granularity '$g' (Spark's date_trunc would return NULL for " +
        s"every row and silently disarm the alarm); use one of $Granularities")

  def countAnomalies(events: DataFrame, key: Column, ts: Column,
      granularity: String = "day", k: Int = 2): DataFrame =
    flagFromCounts(bucketCounts(events, key, ts, granularity), k)

  /** The (key, bucket, c) count table — the state the continuous twin
    * ([[graft.streaming.StreamingPipelines.countSink]]) maintains
    * incrementally: counts SUM, so per-batch partial counts fold
    * exactly and the alarm is batching-independent by construction. */
  def bucketCounts(events: DataFrame, key: Column, ts: Column,
      granularity: String = "day"): DataFrame = {
    requireGranularity(granularity)
    events
      .select(key.cast("string").as("key"), date_trunc(granularity, ts).as("bucket"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Roll an existing (key, bucket, c) count table up to a COARSER
    * granularity — counts are additive, so day buckets re-trunc'd and
    * summed equal counting at the coarse granularity directly
    * (AnomalySpec pins the identity). One fine-granularity registry
    * (`StreamingPipelines.countSink`) therefore serves every coarser
    * alarm: flagFromCounts ∘ rollup gives the weekly/monthly view with
    * no second pass over the events. */
  def rollupCounts(counts: DataFrame, granularity: String): DataFrame = {
    requireGranularity(granularity)
    counts
      .groupBy(col("key"), date_trunc(granularity, col("bucket")).as("bucket"))
      .agg(sum(col("c")).as("c"))
  }

  /** Top movers: per key, the buckets with the largest
    * period-over-period count change — the "what spiked today vs
    * yesterday" dashboard cut, complementary to the z-test (a steady
    * two-day doubling flags here long before it leaves the all-history
    * sigma band). `delta` is vs the PREVIOUS OBSERVED bucket of the same
    * key (missing buckets are absent, per the class contract); the first
    * bucket of a key has no predecessor and is excluded. Ranked by
    * (|delta| desc, bucket) within key, cut at `topN`.
    *
    * Scale: the window runs over the BUCKET COUNTS (bucket-count-sized,
    * key-partitioned — WindowGroupLimit prunes the rank map-side), never
    * the events. */
  def topMovers(counts: DataFrame, topN: Int = 3): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bucket"))
    val ranked = counts
      .select(col("key"), col("bucket"), col("c").cast("long").as("c"))
      .withColumn("prev_c", lag(col("c"), 1).over(byKey))
      .filter(col("prev_c").isNotNull)
      .withColumn("delta", col("c") - col("prev_c"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
          .orderBy(abs(col("delta")).desc, col("bucket"))))
      .filter(col("rk") <= topN)
    ranked.select(col("key"), col("bucket"), col("c"), col("prev_c"),
      col("delta"), col("rk").cast("long").as("rk"))
  }

  /** The z-test over an existing (key, bucket, c) count table (see class
    * doc for the cross-multiplied arithmetic). */
  def flagFromCounts(counts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = counts.select(col("key"), col("bucket"), col("c").cast("long").as("c"))
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val stats = c.groupBy(col("key")).agg(
      count(lit(1)).as("n"),
      sum(dec(col("c"))).as("s"),
      sum(dec(col("c")) * dec(col("c"))).as("q"))
    val lhsRoot = dec(col("n")) * dec(col("c")) - col("s") // n·c − S (signed)
    // null-safe join: a NULL key is a real feed (groupBy keeps it as a
    // group) and must not silently vanish from the alarm — a plain
    // equi-join would drop it (the Sampling.keyStr failure mode)
    c.join(broadcast(stats.withColumnRenamed("key", "__sk")),
        col("key") <=> col("__sk"))
      .select(col("key"), col("bucket"), col("c"),
        when(lhsRoot > 0, 1L).when(lhsRoot < 0, -1L).otherwise(0L).as("direction"),
        (lhsRoot * lhsRoot >
          lit(k.toLong * k) * (dec(col("n")) * col("q") - col("s") * col("s")))
          .as("is_anomaly"))
  }
}
