package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** DWS-layer stateful analytics, batch formulations (SURVEY §2.5 A2/A5-A8).
  * Each has a streaming twin in graft.streaming built on
  * flatMapGroupsWithState; the batch form here is the DuckDB-checkable
  * oracle of record (SURVEY §7.1 "batch-first, stream-equal").
  */
object DwsQueries {

  /** Tiny in-memory dimension (the Dws09 dim-chain stand-in; would be a
    * Delta/JDBC dim table in production — broadcast either way). */
  object ConfigDim {
    def eventTypeDim(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
      import s.implicits._
      Seq(
        ("purchase", "trade"), ("signup", "user"), ("view", "traffic"),
        ("click", "traffic"), ("error", "ops")).toDF("event_type", "category")
    }
  }

  /** A2: global (non-keyed) tumbling window with per-category exact UV
    * (Dws03TrafficPageViewWindow.java:153-177 home/good_detail UV). */
  val a2GlobalWindow: Q = Q(
    "a2_global_window",
    run = (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "10 minutes"))
        .agg(
          countDistinct(when($"event_type" === "view", $"user_id")).as("view_uv"),
          countDistinct(when($"event_type" === "click", $"user_id")).as("click_uv"),
          count(lit(1)).as("pv"))
        .select(
          date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format($"window.end", "yyyy-MM-dd HH:mm:ss").as("edt"),
          $"view_uv", $"click_uv", $"pv")
    },
    oracle = Some("""
      SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/600)*600 AS BIGINT)*1000000), '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(make_timestamp((CAST(floor(epoch(ts)/600)*600 AS BIGINT)+600)*1000000), '%Y-%m-%d %H:%M:%S') AS edt,
             COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS view_uv,
             COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS click_uv,
             COUNT(*) AS pv
      FROM events GROUP BY 1, 2"""))

  /** A5: exact daily UV — the keyed ValueState daily-dedup
    * (Dws02...java:81-153), batch form: distinct per (user, day). */
  val a5DailyUv: Q = Q(
    "a5_daily_uv",
    run = (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(date_format($"ts", "yyyy-MM-dd").as("dt"))
        .agg(countDistinct($"user_id").as("uv_ct"), count(lit(1)).as("pv_ct"))
    },
    oracle = Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS dt,
             COUNT(DISTINCT user_id) AS uv_ct, COUNT(*) AS pv_ct
      FROM events GROUP BY 1"""))

  /** A6: back-flow users — per-user activity-day gaps > 7 days
    * (Dws04UserUserLoginWindow.java:82-125). */
  val a6Backflow: Q = Q(
    "a6_backflow",
    run = (s, dir) => {
      import s.implicits._
      val byDay = Tables.events(s, dir)
        .select($"user_id", to_date($"ts").as("dt")).distinct()
      val w = Window.partitionBy($"user_id").orderBy($"dt")
      byDay
        .withColumn("prev_dt", lag($"dt", 1).over(w))
        .withColumn("is_back", when(datediff($"dt", $"prev_dt") > 7, 1).otherwise(0))
        .groupBy(date_format($"dt", "yyyy-MM-dd").as("dt"))
        .agg(countDistinct($"user_id").as("uu_ct"),
          sum($"is_back").cast("long").as("back_ct"))
    },
    oracle = Some("""
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt FROM events),
           lagd AS (SELECT user_id, dt,
                           lag(dt) OVER (PARTITION BY user_id ORDER BY dt) AS prev_dt
                    FROM ud)
      SELECT strftime(dt, '%Y-%m-%d') AS dt,
             COUNT(DISTINCT user_id) AS uu_ct,
             CAST(SUM(CASE WHEN dt - prev_dt > 7 THEN 1 ELSE 0 END) AS BIGINT) AS back_ct
      FROM lagd GROUP BY 1"""))

  /** A7: new/old visitor repair — per-user first-visit date fixes the
    * is_new flag (BaseLogApp.java:76-106). */
  val a7IsNewRepair: Q = Q(
    "a7_is_new_repair",
    run = (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("dt", to_date($"ts"))
        .withColumn("first_dt", min($"dt").over(Window.partitionBy($"user_id")))
        .withColumn("is_new", when($"dt" === $"first_dt", 1).otherwise(0))
        .groupBy(date_format($"dt", "yyyy-MM-dd").as("dt"), $"is_new")
        .agg(count(lit(1)).as("pv_ct"), countDistinct($"user_id").as("uv_ct"))
    },
    oracle = Some("""
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS dt,
                        MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_dt
                 FROM events)
      SELECT strftime(dt, '%Y-%m-%d') AS dt,
             CASE WHEN dt = first_dt THEN 1 ELSE 0 END AS is_new,
             COUNT(*) AS pv_ct, COUNT(DISTINCT user_id) AS uv_ct
      FROM e GROUP BY 1, 2"""))

  /** A8: first-row dedup by key (Dws09...java:98-145 keyed ValueState
    * marker, TTL = out-of-orderness) — batch: row_number() = 1.
    * Streaming twin: dropDuplicatesWithinWatermark. */
  val a8DedupFirst: Q = Q(
    "a8_dedup_first",
    run = (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type",
          $"event_id".as("first_event_id"),
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("first_ts"))
    },
    oracle = Some("""
      SELECT user_id, event_type, event_id AS first_event_id,
             strftime(date_trunc('microseconds', ts), '%Y-%m-%d %H:%M:%S') AS first_ts
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                         ORDER BY date_trunc('microseconds', ts), event_id) AS rn
            FROM events) t
      WHERE rn = 1"""))

  /** A8+J5+A4 composite — the Dws09TradeSkuOrderWindow end-to-end shape:
    * first-row dedup by key, broadcast dim enrichment, 10-minute tumbling
    * window, exact decimal sums (Dws09...java:98-223). */
  val dws09Composite: Q = Q(
    "dws09_dedup_enrich_window",
    run = (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts", $"event_id")
      val deduped = Tables.events(s, dir)
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      val dim = ConfigDim.eventTypeDim(s)
      deduped
        .join(broadcast(dim), "event_type")
        .groupBy(window($"ts", "10 minutes"), $"category")
        .agg(count(lit(1)).as("ct"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(
          date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format($"window.end", "yyyy-MM-dd HH:mm:ss").as("edt"),
          $"category", $"ct", $"sum_value")
    },
    oracle = Some("""
      WITH dedup AS (
        SELECT * FROM (
          SELECT user_id, event_type, ts, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY date_trunc('microseconds', ts), event_id) AS rn
          FROM events) t WHERE rn = 1),
      enriched AS (
        SELECT d.*, c.category
        FROM dedup d
        JOIN (VALUES ('purchase','trade'), ('signup','user'), ('view','traffic'),
                     ('click','traffic'), ('error','ops')) AS c(event_type, category)
          ON d.event_type = c.event_type)
      SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/600)*600 AS BIGINT)*1000000), '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(make_timestamp((CAST(floor(epoch(ts)/600)*600 AS BIGINT)+600)*1000000), '%Y-%m-%d %H:%M:%S') AS edt,
             category, COUNT(*) AS ct,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM enriched GROUP BY 1, 2, 3"""),
    headline = true)

  /** J7 (beyond the reference): event-time AS-OF join — for each purchase,
    * the latest signup of that user at or before it. Spark has no native
    * as-of join; AsOfJoin implements the single-shuffle union+window
    * formulation; the oracle uses DuckDB's native ASOF LEFT JOIN. */
  val j7AsofJoin: Q = Q(
    "j7_asof_join",
    run = (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts")
      // dedupe right side per (user, ts) so ties are deterministic
      val signups = ev.filter($"event_type" === "signup")
        .groupBy($"user_id", $"ts").agg(max($"event_id").as("signup_id"))
      graft.operators.AsOfJoin.asOf(purchases, "ts", signups, "ts", "user_id", "signup_id")
        .select($"user_id", $"event_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("p_ts"),
          $"asof_signup_id")
    },
    oracle = Some("""
      WITH p AS (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts
                 FROM events WHERE event_type = 'purchase'),
           s AS (SELECT user_id, date_trunc('microseconds', ts) AS ts, MAX(event_id) AS signup_id
                 FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      SELECT p.user_id, p.event_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
             s.signup_id AS asof_signup_id
      FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts"""))

  /** J8 (beyond the reference): point-in-interval range join — orders
    * whose date falls inside any [shipdate, shipdate+30d] window of the
    * quantity-50 lineitems, counted per order. Catalyst would plan the
    * raw theta join as BroadcastNestedLoopJoin; RangeJoin buckets the
    * time axis (2^21 s ≈ 24 d) and equi-joins on the bucket, so both
    * sides shuffle once and candidates are bucket-local. The oracle runs
    * the plain theta join — bucketing must be invisible in the result. */
  val j8RangeJoin: Q = Q(
    "j8_range_join",
    run = (s, dir) => {
      import s.implicits._
      val win = Tables.lineitem(s, dir).filter($"l_quantity" === 50.0)
        .select($"l_orderkey", unix_timestamp($"l_shipdate").as("lo"))
        .withColumn("hi", col("lo") + lit(30L * 86400))
      val pts = Tables.orders(s, dir)
        .select($"o_orderkey", unix_timestamp($"o_orderdate").as("v"))
      graft.operators.RangeJoin
        .pointInInterval(pts, "v", win, "lo", "hi", bucketBits = 21)
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_windows"), min($"l_orderkey").as("first_window"))
    },
    oracle = Some("""
      WITH w AS (SELECT l_orderkey, CAST(epoch(l_shipdate) AS BIGINT) AS lo,
                        CAST(epoch(l_shipdate) AS BIGINT) + 30*86400 AS hi
                 FROM lineitem WHERE l_quantity = 50),
           p AS (SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS v
                 FROM orders)
      SELECT p.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_windows,
             MIN(w.l_orderkey) AS first_window
      FROM p JOIN w ON p.v >= w.lo AND p.v <= w.hi
      GROUP BY 1"""))

  /** J9 (beyond the reference): interval-overlap range join — urgent
    * orders' [orderdate, +7d] windows overlapping quantity-50 lineitems'
    * [shipdate, +30d] windows. Both sides explode to covering buckets;
    * each pair is emitted only in the canonical bucket (the overlap's
    * left edge), so no distinct is needed — the plain-theta oracle
    * certifies both the match set and the exactly-once emission. */
  val j9RangeOverlap: Q = Q(
    "j9_range_overlap",
    run = (s, dir) => {
      import s.implicits._
      val a = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", unix_timestamp($"o_orderdate").as("a_lo"))
        .withColumn("a_hi", col("a_lo") + lit(7L * 86400))
      val b = Tables.lineitem(s, dir).filter($"l_quantity" === 50.0)
        .select($"l_orderkey", unix_timestamp($"l_shipdate").as("b_lo"))
        .withColumn("b_hi", col("b_lo") + lit(30L * 86400))
      graft.operators.RangeJoin
        .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", bucketBits = 21)
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_overlaps"), min($"l_orderkey").as("first_overlap"))
    },
    oracle = Some("""
      WITH a AS (SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS a_lo,
                        CAST(epoch(o_orderdate) AS BIGINT) + 7*86400 AS a_hi
                 FROM orders WHERE o_orderpriority = '1-URGENT'),
           b AS (SELECT l_orderkey, CAST(epoch(l_shipdate) AS BIGINT) AS b_lo,
                        CAST(epoch(l_shipdate) AS BIGINT) + 30*86400 AS b_hi
                 FROM lineitem WHERE l_quantity = 50)
      SELECT a.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
             MIN(b.l_orderkey) AS first_overlap
      FROM a JOIN b ON a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
      GROUP BY 1"""))

  /** A10 (beyond the reference): session windows — 30-minute-gap sessions
    * per user (Spark session_window ≡ gaps-and-islands in the oracle). */
  val a10SessionWindow: Q = Q(
    "a10_session_window",
    run = (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id",
          date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format($"session_window.end", "yyyy-MM-dd HH:mm:ss").as("edt"),
          $"n_events")
    },
    oracle = Some("""
      WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events),
      flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT user_id,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS edt,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid"""))

  /** First-touch funnel view → click → purchase: per-user earliest stage
    * times under strictly-after ordering, stage = deepest reached. The
    * oracle recomposes the per-stage MIN + strictly-after join chain;
    * epoch-microsecond outputs keep the timestamp compare exact. */
  val a11Funnel: Q = Q(
    "a11_funnel",
    run = (s, dir) => graft.operators.Funnel.stages(
      // sparse 1-in-19 slice: the dense synthetic stream funnels every
      // user to the last stage, which exercises nothing — the slice
      // leaves all stage depths (and absent users) populated
      Tables.events(s, dir).filter(col("event_id") % 19 === 0),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase")),
    oracle = Some("""
      WITH ev AS (SELECT * FROM events WHERE event_id % 19 = 0),
      v AS (SELECT user_id, MIN(ts) AS t0 FROM ev
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM ev e
            JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
            WHERE e.event_type = 'click' GROUP BY 1),
      p AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e
            JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
            WHERE e.event_type = 'purchase' GROUP BY 1)
      SELECT v.user_id,
        epoch_us(v.t0) AS t0_us, epoch_us(c.t1) AS t1_us, epoch_us(p.t2) AS t2_us,
        CASE WHEN p.t2 IS NOT NULL THEN 3
             WHEN c.t1 IS NOT NULL THEN 2 ELSE 1 END AS stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON c.user_id = p.user_id"""))

  /** Retention cohort triangle: users grouped by first-seen date, active
    * distinct-user counts per (cohort, day offset) — day_offset 0 is the
    * cohort size. One (user, day) distinct, one user-keyed join to the
    * per-user first date, one partial-agged (cohort, offset) count. */
  val a12Retention: Q = Q(
    "a12_retention",
    run = (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val first = ev.groupBy($"user_id").agg(min(to_date($"ts")).as("cohort_d"))
      val active = ev.select($"user_id", to_date($"ts").as("d")).distinct()
      active.join(first, "user_id")
        .groupBy($"cohort_d", datediff($"d", $"cohort_d").as("day_offset"))
        .agg(countDistinct($"user_id").as("n_users"))
        .select(date_format($"cohort_d", "yyyy-MM-dd").as("cohort"),
          $"day_offset", $"n_users")
    },
    oracle = Some("""
      WITH first AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_d
                     FROM events GROUP BY 1),
      act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      SELECT strftime(f.cohort_d, '%Y-%m-%d') AS cohort,
             CAST(a.d - f.cohort_d AS INTEGER) AS day_offset,
             COUNT(DISTINCT a.user_id) AS n_users
      FROM act a JOIN first f ON a.user_id = f.user_id
      GROUP BY 1, 2"""))

  /** Windowed count-anomaly alarm: daily per-type event counts flagged
    * when they leave the type's own ±2σ band — via the exact integer
    * cross-multiplied z-test (n·c − S)² > k²(n·Q − S²), so no float and
    * no sqrt enters the cross-engine compare. Both flag values are live
    * at every gate SF (2σ fires on the synthetic stream; 3σ would not
    * at sf0.001). */
  val a13CountAnomaly: Q = Q(
    "a13_count_anomaly",
    run = (s, dir) => graft.operators.Anomaly.countAnomalies(
        Tables.events(s, dir), col("event_type"), col("ts"), "day", k = 2)
      .select(col("key"), date_format(col("bucket"), "yyyy-MM-dd").as("d"),
        col("c"), col("direction"), col("is_anomaly")),
    oracle = Some("""
      WITH c AS (SELECT event_type AS key,
          strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      s AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(c AS HUGEINT)) AS sm, SUM(CAST(c AS HUGEINT) * c) AS q
        FROM c GROUP BY 1)
      SELECT c.key, c.d, c.c,
        CAST(CASE WHEN n * c.c - sm > 0 THEN 1
                  WHEN n * c.c - sm < 0 THEN -1 ELSE 0 END AS BIGINT) AS direction,
        (n * c.c - sm) * (n * c.c - sm) > 4 * (n * q - sm * sm) AS is_anomaly
      FROM c JOIN s USING (key)"""))

  /** Rollup identity cross-engine: day counts rolled up to month equal
    * counting at month directly — the property that lets ONE
    * fine-granularity count registry serve every coarser alarm with no
    * second pass over the events (the oracle counts at month). */
  val a14CountRollup: Q = Q(
    "a14_count_rollup",
    run = (s, dir) => graft.operators.Anomaly.rollupCounts(
        graft.operators.Anomaly.bucketCounts(
          Tables.events(s, dir), col("event_type"), col("ts"), "day"),
        "month")
      .select(col("key"), date_format(col("bucket"), "yyyy-MM-dd").as("d"), col("c")),
    oracle = Some("""
      SELECT event_type AS key, strftime(date_trunc('month', ts), '%Y-%m-%d') AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2"""))

  /** Day-over-day top movers per event type: the largest absolute count
    * change vs the previous observed day, top-3 per key — the dashboard
    * cut complementary to a13's all-history sigma band. */
  val a15CountMovers: Q = Q(
    "a15_count_movers",
    run = (s, dir) => graft.operators.Anomaly.topMovers(
        graft.operators.Anomaly.bucketCounts(
          Tables.events(s, dir), col("event_type"), col("ts"), "day"),
        topN = 3)
      .select(col("key"), date_format(col("bucket"), "yyyy-MM-dd").as("d"),
        col("c"), col("prev_c"), col("delta"), col("rk")),
    oracle = Some("""
      WITH c AS (SELECT event_type AS key,
          strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      l AS (SELECT key, d, c,
          lag(c) OVER (PARTITION BY key ORDER BY d) AS prev_c
        FROM c),
      r AS (SELECT key, d, c, prev_c, c - prev_c AS delta,
          CAST(row_number() OVER (PARTITION BY key
            ORDER BY abs(c - prev_c) DESC, d) AS BIGINT) AS rk
        FROM l WHERE prev_c IS NOT NULL)
      SELECT key, d, c, prev_c, delta, rk FROM r WHERE rk <= 3"""))

  /** Freshness audit: newest event + lag vs a pinned reference instant
    * per type — asOf is a parameter, never the wall clock, so the audit
    * is deterministic and oracle-checkable (epoch-microsecond outputs
    * keep the compare exact, the a11_funnel rule). */
  val tAuditFreshness: Q = Q(
    "t_audit_freshness",
    run = (s, dir) => graft.operators.Audit.freshness(
      Tables.events(s, dir), col("event_type"), col("ts"),
      java.time.Instant.parse("2024-02-01T00:00:00Z")),
    oracle = Some("""
      SELECT event_type AS key, epoch_us(MAX(ts)) AS last_ts_us,
             epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(MAX(ts)) AS lag_us
      FROM events GROUP BY 1"""))

  /** Coverage-gap audit: three days of click events are deliberately
    * dropped, and the audit must report EXACTLY those (key, day) holes —
    * the feed-went-dark finding the anomaly alarm's absent-bucket
    * contract hands off to this operator. */
  val tAuditCoverage: Q = Q(
    "t_audit_coverage",
    run = (s, dir) => graft.operators.Audit.coverageGaps(
        Tables.events(s, dir).filter(
          !(col("event_type") === "click" &&
            dayofmonth(col("ts")).isin(10, 11, 12) && month(col("ts")) === 1)),
        col("event_type"), col("ts"))
      .select(col("key"), date_format(col("bucket"), "yyyy-MM-dd").as("d")),
    oracle = Some("""
      WITH ev AS (SELECT * FROM events
        WHERE NOT (event_type = 'click'
          AND day(ts) IN (10, 11, 12) AND month(ts) = 1)),
      obs AS (SELECT DISTINCT event_type AS key, date_trunc('day', ts) AS bucket FROM ev),
      spans AS (SELECT key, MIN(bucket) AS lo, MAX(bucket) AS hi FROM obs GROUP BY 1),
      dense AS (SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
                FROM spans)
      SELECT f.key, strftime(f.bucket, '%Y-%m-%d') AS d
      FROM dense f LEFT JOIN obs o ON f.key = o.key AND f.bucket = o.bucket
      WHERE o.key IS NULL"""))

  val all: Seq[Q] = Seq(
    a2GlobalWindow, a5DailyUv, a6Backflow, a7IsNewRepair, a8DedupFirst,
    dws09Composite, j7AsofJoin, j8RangeJoin, j9RangeOverlap, a10SessionWindow,
    a11Funnel, a12Retention, a13CountAnomaly, a14CountRollup, a15CountMovers,
    tAuditFreshness, tAuditCoverage)
}
