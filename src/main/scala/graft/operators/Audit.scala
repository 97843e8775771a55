package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audits — the checks a warehouse runs BEFORE trusting a
  * layer enough to join against it (the reference's dim/fact contract,
  * `DimApp`/`DwdTradeOrderDetail`, silently assumes them; here they're
  * queryable):
  *
  *  - referential integrity: child keys that resolve to no parent row
  *    (a CDC feed that dropped a dim upsert, a late dim arrival);
  *  - column profile: per-column null rate / distinct count / min-max —
  *    the DESCRIBE-grade snapshot a schema-drift monitor diffs.
  *
  * All counts exact; everything reduces to keyed aggs and one anti-join.
  */
object Audit {

  /** Orphan check: one row per audit —
    * (n_child, n_distinct_keys, n_orphan_rows, n_orphan_keys, ok).
    * NULL child keys are counted separately via `n_null_keys` (a NULL FK
    * is a different defect than a dangling one and must not hide in
    * either count).
    *
    * Scale: ONE pass over the child — a LEFT OUTER join against the
    * parent's DISTINCT key set marks each row matched/orphaned/null and
    * a single conditional agg produces every count (a separate
    * anti-join branch would scan the 100 TB child twice; the parent
    * side collapses to its keys before shuffling and AQE broadcasts it
    * when dimension-sized — the common case). */
  def referentialIntegrity(child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val ck = child.select(childKey.cast("string").as("k"))
    val pk = parent.select(parentKey.cast("string").as("k"))
      .filter(col("k").isNotNull).distinct()
      .withColumn("__hit", lit(1))
    val orphan = col("k").isNotNull && col("__hit").isNull
    ck.join(pk, Seq("k"), "left")
      // coalesce: a zero-row child makes the sum() aggregates NULL, and a
      // NULL `ok` vanishes from both the pass AND fail lists of a monitor
      // — an empty child is a PASSING audit (nothing can dangle)
      .agg(count(lit(1)).as("n_child"),
        coalesce(sum(when(col("k").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null_keys"),
        count_distinct(col("k")).as("n_distinct_keys"),
        coalesce(sum(when(orphan, 1L).otherwise(0L)), lit(0L)).as("n_orphan_rows"),
        count_distinct(when(orphan, col("k"))).as("n_orphan_keys"))
      .select(col("n_child"), col("n_null_keys"), col("n_distinct_keys"),
        col("n_orphan_rows"), col("n_orphan_keys"),
        (col("n_orphan_rows") === 0L && col("n_null_keys") === 0L).as("ok"))
  }

  /** Freshness audit: per key, the newest event time and its lag vs a
    * caller-supplied reference instant — the "which feed went stale"
    * check. `asOf` is an explicit parameter, NOT the wall clock: the
    * audit stays deterministic, replayable, and oracle-checkable (pass
    * the batch's own max, a trigger time, or Instant.now() at the call
    * site) — and an [[java.time.Instant]], an absolute point on the
    * timeline, so no host timezone enters the lag (a java.sql.Timestamp
    * literal parses in the JVM default zone and would shift the audit
    * by the host's UTC offset). One key-keyed max agg — scan speed. */
  def freshness(df: DataFrame, key: Column, ts: Column,
      asOf: java.time.Instant): DataFrame =
    df.select(key.cast("string").as("key"), ts.as("ts"))
      .groupBy(col("key"))
      .agg(max(col("ts")).as("last_ts"))
      .select(col("key"),
        unix_micros(col("last_ts")).as("last_ts_us"),
        (unix_micros(lit(asOf)) - unix_micros(col("last_ts"))).as("lag_us"))

  /** Coverage-gap audit: the buckets in [first, last] of each key where
    * NO event landed — the silence anomaly [[Anomaly.countAnomalies]]
    * deliberately does not cover (its missing buckets are absent rows; a
    * feed going dark is THIS audit's finding). Bucket range is per key
    * (a source that onboarded late is not "missing" its pre-history).
    *
    * Scale: per-key min/max (one keyed agg), then `sequence()` explodes
    * ONLY the key's own range — output work is proportional to
    * key-count × range, independent of event count — anti-joined
    * against the observed (key, bucket) set. Day granularity (the
    * sequence step is a literal interval). */
  def coverageGaps(events: DataFrame, key: Column, ts: Column): DataFrame = {
    val observed = events
      .select(key.cast("string").as("key"), date_trunc("day", ts).as("bucket"))
      .distinct()
    val spans = observed.filter(col("bucket").isNotNull).groupBy(col("key"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    // null-safe anti-join: a NULL-keyed feed's observed days must match
    // its own densified range — a plain anti-join never matches NULL keys
    // and would report every day of a healthy feed as a gap
    val dense = spans.select(col("key"),
      explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("bucket"))
    dense.join(observed.withColumnsRenamed(Map("key" -> "__ok", "bucket" -> "__ob")),
        col("key") <=> col("__ok") && col("bucket") === col("__ob"), "left_anti")
  }

  /** Per-column profile of the named columns:
    * (col_name, n, n_null, n_distinct, min_str, max_str) — one frame
    * profiles heterogeneous columns by rendering values as strings, but
    * min/max are computed on the ORIGINAL type and rendered AFTER, so
    * numeric/date order is preserved ('9' > '10' as strings would lie).
    * Distinct counts are EXACT — the audit's point is a number a drift
    * diff can trust; at corpus scale profile a column subset or a
    * sampled slice instead of weakening the count. Doubles render
    * engine-differently in exponent ranges — profile them for n/null/
    * distinct and read min/max from a numeric query if exact parity
    * matters.
    *
    * Scale: one stacked (col_name, value) projection into a keyed agg
    * with exact per-column distincts, plus ONE single-row agg for the
    * typed min/max — two keyed shuffles over #cols × rows, the honest
    * price of exact distincts across many columns in one frame. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val stacked = df.select(explode(array(cols.map { c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))
    }: _*)).as("s")).select(col("s.col_name").as("col_name"), col("s.v").as("v"))
    val counts = stacked.groupBy(col("col_name")).agg(
      count(lit(1)).as("n"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      count_distinct(col("v")).as("n_distinct"))
    val mmAggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(s"__min_$c").as("min_str"),
          col(s"__max_$c").as("max_str"))
      }: _*)).as("s")).select(col("s.col_name").as("col_name"),
        col("s.min_str"), col("s.max_str"))
    // mm is the base: a global agg yields its one row even over an EMPTY
    // frame, so every requested column keeps an (n=0) profile row — an
    // empty table must read as "all columns empty", not "all columns
    // dropped" (indistinguishable from schema drift otherwise)
    mm.join(counts, Seq("col_name"), "left")
      .select(col("col_name"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_null"), lit(0L)).as("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_str"), col("max_str"))
  }
}
