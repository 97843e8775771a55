package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.tables.Tables
import graft.operators.ConfigRouter

/** DWD-layer operators (SURVEY §2.3/§2.8/§2.1-2.2 batch formulations):
  * JSON parse + quarantine, payload projection, multi-way demux,
  * config-driven routing. Mapped onto `events` per FIXTURES.md §8.
  */
object DwdQueries {

  private val dec = DecimalType(18, 2)

  /** P1/X2: try-parse JSON payload; failures routed to a quarantine bucket
    * (BaseLogApp.java:53-69 side-output split). */
  val p1Quarantine: Q = Q(
    "p1_quarantine_split",
    run = (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("k",
          from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
        .groupBy(when($"k".isNull, "quarantine").otherwise("parsed").as("route"))
        .agg(count(lit(1)).as("ct"), sum($"k").cast("long").as("sum_k"))
    },
    oracle = Some("""
      SELECT CASE WHEN k IS NULL THEN 'quarantine' ELSE 'parsed' END AS route,
             COUNT(*) AS ct, CAST(SUM(k) AS BIGINT) AS sum_k
      FROM (SELECT try_cast(json_extract_string(props, '$.k') AS INT) AS k FROM events) t
      GROUP BY 1"""))

  /** P4: filtered projection over the JSON payload (DwdTradeCartAdd.java:80-98
    * `data['id'] id ... where type='insert'`). */
  val p4JsonProjection: Q = Q(
    "p4_json_projection",
    run = (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .filter($"event_type" === "purchase")
        .select(
          $"event_id", $"user_id",
          get_json_object($"props", "$.k").cast("int").as("k"),
          $"value".cast(dec).cast("double").as("amount"))
    },
    oracle = Some("""
      SELECT event_id, user_id,
             try_cast(json_extract_string(props, '$.k') AS INT) AS k,
             CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS amount
      FROM events WHERE event_type = 'purchase'"""))

  /** X1: 5-way demultiplex (BaseLogApp.java:108-204 side-output split —
    * in Spark one cleansed frame + per-route filters; here summarized as a
    * route column so the split is oracle-checkable). */
  val x1Demux: Q = Q(
    "x1_demux",
    run = (s, dir) => {
      import s.implicits._
      val route = when($"event_type" === "error", "error")
        .when($"event_type" === "signup", "start")
        .when($"event_type" === "view", "display")
        .when($"event_type" === "click", "action")
        .otherwise("page")
      Tables.events(s, dir)
        .groupBy(route.as("route"))
        .agg(count(lit(1)).as("ct"), countDistinct($"user_id").as("uu_ct"))
    },
    oracle = Some("""
      SELECT CASE event_type WHEN 'error' THEN 'error' WHEN 'signup' THEN 'start'
                  WHEN 'view' THEN 'display' WHEN 'click' THEN 'action'
                  ELSE 'page' END AS route,
             COUNT(*) AS ct, COUNT(DISTINCT user_id) AS uu_ct
      FROM events GROUP BY 1"""))

  /** J4+P8+P9+K2: config-driven router (see ConfigRouter scaladoc).
    * Aggregated per sink so row-filter + column-prune are both observable. */
  val j4ConfigRouter: Q = Q(
    "j4_config_router",
    run = (s, dir) => {
      import s.implicits._
      ConfigRouter.route(s, Tables.events(s, dir))
        .groupBy($"sink_table")
        .agg(count(lit(1)).as("ct"), max(size($"payload")).cast("long").as("n_cols"))
    },
    oracle = Some("""
      SELECT sink_table, COUNT(*) AS ct, CAST(MAX(n_cols) AS BIGINT) AS n_cols
      FROM events
      JOIN (VALUES ('purchase','dwd_trade_order',3), ('signup','dwd_user_register',2),
                   ('view','dwd_traffic_page',3), ('error','dwd_error_log',2))
           AS c(source_type, sink_table, n_cols)
        ON event_type = source_type
      GROUP BY sink_table"""))

  /** K6: dynamic DDL — the router creates per-route managed tables on the
    * fly (CREATE TABLE IF NOT EXISTS, all-STRING schema) and idempotently
    * loads them; the query output is read back from the CATALOG, so the
    * oracle match proves both the DDL and the loaded row counts
    * (DIM_MyBroadcastFunction.java:138-200). */
  val k6DynamicDdl: Q = Q(
    "k6_dynamic_ddl",
    run = (s, dir) =>
      ConfigRouter.materializeRoutes(s, Tables.events(s, dir)),
    oracle = Some("""
      SELECT sink_table, COUNT(*) AS n_rows, CAST(n_cols AS BIGINT) AS n_cols
      FROM events
      JOIN (VALUES ('purchase','dwd_trade_order',3), ('signup','dwd_user_register',2),
                   ('view','dwd_traffic_page',3), ('error','dwd_error_log',2))
           AS c(source_type, sink_table, n_cols)
        ON event_type = source_type
      GROUP BY sink_table, n_cols"""))

  /** K5/K6: dynamic-DDL UPSERT load — the reference's DIM-layer Phoenix
    * contract (DIM_SinkFunction.java:28-92): rows accumulate across
    * loads and a later row replaces the stored row with the same pk.
    * Two loads: (1) every purchase with user_id shifted +1000 (stale dim
    * rows), (2) the TRUE rows for even event_ids only. The final table
    * must hold the true row where load 2 covered the pk and the stale
    * load-1 row everywhere else — exactly what snapshot overwrite
    * (materializeRoutes) would get wrong, since it would drop all odd
    * event_ids. */
  val k6UpsertRoutes: Q = Q(
    "k6_upsert_routes",
    run = (s, dir) => {
      val db = "graft_dim_oracle"
      // self-contained: reset catalog state so re-runs start empty (the
      // create-time sentinel lets a NEW session reclaim the old location)
      s.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
      val ev = Tables.events(s, dir)
      ConfigRouter.upsertRoutes(s, ev.withColumn("user_id", col("user_id") + 1000), dbName = db)
      ConfigRouter.upsertRoutes(s, ev.filter(col("event_id") % 2 === 0), dbName = db)
      s.table(s"$db.dwd_trade_order")
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"))
    },
    oracle = Some("""
      SELECT event_id,
             CASE WHEN event_id % 2 = 0 THEN user_id
                  ELSE user_id + 1000 END AS user_id
      FROM events WHERE event_type = 'purchase'"""))

  /** P12/P13: date/time scalar kernel (DateFormatUtil.java:14-39) —
    * month bucketing, epoch seconds, day strings. */
  val p12TimeFunctions: Q = Q(
    "p12_time_functions",
    run = (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          min(unix_timestamp($"o_orderdate")).as("min_epoch"),
          max(date_format($"o_orderdate", "yyyy-MM-dd")).as("max_day"))
    },
    oracle = Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             COUNT(*) AS n_orders,
             CAST(MIN(epoch(o_orderdate)) AS BIGINT) AS min_epoch,
             MAX(strftime(o_orderdate, '%Y-%m-%d')) AS max_day
      FROM orders GROUP BY 1"""))

  /** J2: left outer join with null-to-zero coalescing (order_detail left
    * joins, DwdTradeOrderDetail.java:164-167 + P11 money coalescing). */
  val j2LeftJoin: Q = Q(
    "j2_left_join",
    run = (s, dir) => {
      import s.implicits._
      val per = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("items"),
          sum($"l_quantity".cast(dec)).cast("double").as("qty"))
      Tables.orders(s, dir)
        .join(per, $"o_orderkey" === $"l_orderkey", "left")
        .select($"o_orderkey", $"o_orderstatus",
          coalesce($"items", lit(0L)).as("n_items"),
          coalesce($"qty", lit(0.0)).as("sum_qty"))
    },
    oracle = Some("""
      SELECT o_orderkey, o_orderstatus,
             COALESCE(items, 0) AS n_items, COALESCE(qty, 0.0) AS sum_qty
      FROM orders
      LEFT JOIN (SELECT l_orderkey, COUNT(*) AS items,
                        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
                 FROM lineitem GROUP BY 1) li
        ON o_orderkey = l_orderkey"""))

  /** J3/S5: lookup join against a small dimension, broadcast
    * (`FOR SYSTEM_TIME AS OF` base_dic lookup ≈ broadcast stream-static join). */
  val j3LookupJoin: Q = Q(
    "j3_lookup_join",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val pt = Tables.part(s, dir)
      li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_extendedprice".cast(dec)).cast("double").as("sum_price"))
    },
    oracle = Some("""
      SELECT p_brand, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand"""))

  /** P10 full shape (BaseLogApp.java:114-176): nested log events with a
    * displays array — built in-query as JSON, parsed against the nested
    * schema, exploded with page/event context stamped into each display
    * row. The oracle recomputes the same rows directly, so the JSON
    * roundtrip + explode must be a faithful identity. */
  val p10LogPipeline: Q = Q(
    "p10_log_pipeline",
    run = (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val ev = Tables.events(s, dir)
      // displays: pos_id 1..(user_id%3), item = event_id*10 + (pos_id-1)
      val displays = filter(
        transform(sequence(lit(1), lit(3)), i =>
          struct(i.as("pos_id"), ($"event_id" * 10 + (i - 1)).as("item"))),
        d => d.getField("pos_id") <= $"user_id" % 3)
      val raw = ev.select(to_json(struct(
        $"event_id",
        struct($"event_type".as("page_id")).as("page"),
        unix_millis($"ts").as("ts"),
        displays.as("displays"))).as("value"))
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("page", StructType(Seq(StructField("page_id", StringType)))),
        StructField("ts", LongType),
        StructField("displays", ArrayType(StructType(Seq(
          StructField("pos_id", IntegerType), StructField("item", LongType)))))))
      raw.select(from_json($"value", schema).as("e"))
        .select($"e.event_id", $"e.page.page_id".as("page_id"), explode($"e.displays").as("d"))
        .select($"page_id", $"d.pos_id".as("pos_id"), $"d.item".as("item"))
        .groupBy($"page_id", $"pos_id")
        .agg(count(lit(1)).as("ct"), sum($"item").as("sum_item"))
    },
    oracle = Some("""
      WITH e AS (SELECT event_id, event_type AS page_id, CAST(user_id % 3 AS INT) AS nd FROM events),
      x AS (SELECT event_id, page_id, CAST(u.i + 1 AS INT) AS pos_id, event_id*10 + u.i AS item
            FROM e, unnest(range(e.nd)) AS u(i))
      SELECT page_id, pos_id, COUNT(*) AS ct, CAST(SUM(item) AS BIGINT) AS sum_item
      FROM x GROUP BY 1, 2"""))

  val all: Seq[Q] = Seq(
    p1Quarantine, p4JsonProjection, x1Demux, j4ConfigRouter, k6DynamicDdl,
    k6UpsertRoutes,
    p12TimeFunctions, j2LeftJoin, j3LookupJoin, p10LogPipeline)
}
