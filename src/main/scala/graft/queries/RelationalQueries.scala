package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.tables.Tables

/** Relational breadth beyond the reference's declared surface — SURVEY
  * §2.4/§2.7 notes these come free from Catalyst (semi/anti joins, set
  * ops, rollup, analytic windows); they're part of "a user could switch",
  * so each is exercised and oracle-checked.
  */
object RelationalQueries {

  private val dec = DecimalType(18, 2)

  /** TPC-H Q6 shape: tight scan-side filters (date range + predicates),
    * single agg — the predicate-pushdown showcase. */
  val q6Revenue: Q = Q(
    "q6_filtered_revenue",
    run = (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1994-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1995-01-01").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(sum(($"l_extendedprice".cast(dec) * $"l_discount".cast(dec)))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    },
    oracle = Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** Semi + anti joins: customers with orders (EXISTS) and without
    * (NOT EXISTS), summarized per market segment. */
  val jSemiAnti: Q = Q(
    "j_semi_anti",
    run = (s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
      val withOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("with_orders"))
      val withoutOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("without_orders"))
      withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
        .select($"c_mktsegment",
          coalesce($"with_orders", lit(0L)).as("with_orders"),
          coalesce($"without_orders", lit(0L)).as("without_orders"))
    },
    oracle = Some("""
      WITH w AS (SELECT c_mktsegment, COUNT(*) AS with_orders FROM customer
                 WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1),
           wo AS (SELECT c_mktsegment, COUNT(*) AS without_orders FROM customer
                  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1)
      SELECT COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
             COALESCE(with_orders, 0) AS with_orders,
             COALESCE(without_orders, 0) AS without_orders
      FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment"""))

  /** Set operations: UNION / INTERSECT / EXCEPT over key sets. */
  val setOps: Q = Q(
    "set_ops",
    run = (s, dir) => {
      import s.implicits._
      val buyers = Tables.orders(s, dir).select($"o_custkey".as("k")).distinct()
      val highValue = Tables.orders(s, dir)
        .filter($"o_totalprice" > 200000).select($"o_custkey".as("k")).distinct()
      val all = Tables.customer(s, dir).select($"c_custkey".as("k"))
      Seq(
        ("union", all.union(buyers).distinct()),
        ("intersect", buyers.intersect(highValue)),
        ("except", all.except(buyers)))
        .map { case (op, df) =>
          df.agg(count(lit(1)).as("ct"), min($"k").as("min_k"))
            .select(lit(op).as("op"), $"ct", $"min_k")
        }
        .reduce(_.unionByName(_))
    },
    oracle = Some("""
      WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
           hv AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 200000),
           allc AS (SELECT c_custkey AS k FROM customer)
      SELECT 'union' AS op, COUNT(*) AS ct, MIN(k) AS min_k FROM (SELECT k FROM allc UNION SELECT k FROM buyers)
      UNION ALL
      SELECT 'intersect', COUNT(*), MIN(k) FROM (SELECT k FROM buyers INTERSECT SELECT k FROM hv)
      UNION ALL
      SELECT 'except', COUNT(*), MIN(k) FROM (SELECT k FROM allc EXCEPT SELECT k FROM buyers)"""))

  /** Rollup (multi-level aggregation in one pass; grouping id exposed). */
  val rollupRevenue: Q = Q(
    "rollup_revenue",
    run = (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("ct"),
          sum($"o_totalprice".cast(dec)).cast("double").as("total"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"ct", $"total")
    },
    oracle = Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS ct,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""))

  /** Analytic window functions: rank + running sum per partition
    * (the batch-oracle machinery of §2.6, exposed as first-class). */
  val windowAnalytics: Q = Q(
    "window_analytics",
    run = (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey").orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      Tables.lineitem(s, dir)
        .filter($"l_suppkey" <= 3)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          row_number().over(w).as("rn"),
          sum($"l_quantity".cast(dec)).over(w).cast("double").as("running_qty"),
          lag($"l_orderkey", 1).over(w).as("prev_order"))
    },
    oracle = Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             row_number() OVER w AS rn,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_qty,
             lag(l_orderkey, 1) OVER w AS prev_order
      FROM lineitem WHERE l_suppkey <= 3
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)"""))

  /** HLL sketch UV (approx_count_distinct). Sketch values differ across
    * engines, so the sketch itself cannot be oracle-hashed — instead the
    * query is SELF-VALIDATING: it computes the exact UV alongside and emits
    * `ok` = relative error within 10% (5× the requested rsd 0.02). The
    * oracle reproduces the exact columns and asserts `ok` is literally TRUE,
    * so the hash match IS the error-bound gate (ApproxSpec holds the
    * tighter measured bound). At scale only the HLL branch would run; the
    * exact branch is the verification harness. */
  val approxUv: Q = Q(
    "a5_approx_uv",
    run = (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(date_format($"ts", "yyyy-MM-dd").as("dt"))
        .agg(approx_count_distinct($"user_id", 0.02).as("approx_uv"),
          countDistinct($"user_id").as("exact_uv"))
        .select($"dt", $"exact_uv",
          (abs($"approx_uv" - $"exact_uv").cast("double") / $"exact_uv" <= 0.10).as("ok"))
    },
    oracle = Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS dt,
             COUNT(DISTINCT user_id) AS exact_uv,
             TRUE AS ok
      FROM events GROUP BY 1"""))

  /** Approximate percentiles (Greenwald-Khanna sketch). Self-validating on
    * the same pattern as a5_approx_uv: exact percentile_disc alongside the
    * sketch, `ok` = both approximations within 2% relative error; the
    * oracle emits the exact columns + TRUE so the hash match gates the
    * bound. */
  val approxPercentiles: Q = Q(
    "approx_percentiles",
    run = (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(percentile_approx($"l_extendedprice", array(lit(0.5), lit(0.95)), lit(1000))
          .as("p50_p95"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50_exact"),
          expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95_exact"))
        .select($"l_returnflag", $"p50_exact", $"p95_exact",
          (abs(element_at($"p50_p95", 1) - $"p50_exact") / $"p50_exact" <= 0.02 &&
            abs(element_at($"p50_p95", 2) - $"p95_exact") / $"p95_exact" <= 0.02).as("ok"))
    },
    oracle = Some("""
      SELECT l_returnflag,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50_exact,
             percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95_exact,
             TRUE AS ok
      FROM lineitem GROUP BY 1"""))

  /** TPC-H Q4 shape: EXISTS with a correlated predicate + date-range scan. */
  val q4OrderPriority: Q = Q(
    "q4_order_priority",
    run = (s, dir) => {
      import s.implicits._
      val ord = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir).filter($"l_quantity" > 45)
      ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },
    oracle = Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority"""))

  /** TPC-H Q2-style correlated scalar subquery: parts at their minimum
    * retail price tier within each type. */
  val q2MinCost: Q = Q(
    "q2_min_cost_part",
    run = (s, dir) => {
      import s.implicits._
      val pt = Tables.part(s, dir)
      val minPerType = pt.groupBy($"p_type").agg(min($"p_retailprice").as("min_price"))
      pt.join(minPerType, "p_type")
        .filter($"p_retailprice" === $"min_price")
        .select($"p_type", $"p_partkey", $"p_retailprice".cast(DecimalType(18, 2)).cast("double").as("price"))
    },
    oracle = Some("""
      SELECT p_type, p_partkey, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      FROM part
      WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = part.p_type)"""))

  /** TPC-H Q16 shape: distinct counts with a NOT IN exclusion list. */
  val q16SupplierCounts: Q = Q(
    "q16_part_supplier_counts",
    run = (s, dir) => {
      import s.implicits._
      val excluded = Tables.supplier(s, dir)
        .filter($"s_acctbal" < 0).select($"s_suppkey")
      val li = Tables.lineitem(s, dir)
      val pt = Tables.part(s, dir)
      li.join(excluded, li("l_suppkey") === excluded("s_suppkey"), "left_anti")
        .join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .groupBy($"p_brand", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
    },
    oracle = Some("""
      SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_size"""))

  /** TPC-H Q22 shape: above-average-balance customers with no URGENT
    * orders (aggregate subquery + conditional anti join). */
  val q22IdleRich: Q = Q(
    "q22_idle_customers",
    run = (s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir)
      val avgBal = cust.filter($"c_acctbal" > 0)
        .agg(avg($"c_acctbal").as("ab"))
      val urgent = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
      cust.crossJoin(broadcast(avgBal))
        .filter($"c_acctbal" > $"ab")
        .join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum($"c_acctbal".cast(DecimalType(18, 2))).cast("double").as("totacctbal"))
    },
    oracle = Some("""
      SELECT c_nationkey, COUNT(*) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM customer
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_nationkey"""))

  /** Pivot: order counts per priority pivoted on status (wide-format
    * reporting — compiles to conditional aggregation). */
  val pivotStatus: Q = Q(
    "pivot_status",
    run = (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .pivot($"o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_orderpriority",
          coalesce($"F", lit(0L)).as("f_ct"),
          coalesce($"O", lit(0L)).as("o_ct"),
          coalesce($"P", lit(0L)).as("p_ct"))
    },
    oracle = Some("""
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_ct,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_ct,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_ct
      FROM orders GROUP BY o_orderpriority"""))

  /** Moments from exact sums: mean and population variance derived from
    * DECIMAL sum / sum-of-squares (deterministic across partition order —
    * the float-safe way to do statistics at scale; stddev_pop's streaming
    * accumulation would be partition-order dependent). */
  val statsMoments: Q = Q(
    "stats_moments",
    run = (s, dir) => {
      import s.implicits._
      val d4 = DecimalType(28, 4)
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum($"l_quantity".cast(dec)).cast("double").as("s1"),
          sum(($"l_quantity".cast(dec) * $"l_quantity".cast(dec)).cast(d4)).cast("double").as("s2"))
        .select($"l_returnflag", $"n",
          ($"s1" / $"n").as("mean"),
          ($"s2" / $"n" - ($"s1" / $"n") * ($"s1" / $"n")).as("var_pop"))
    },
    oracle = Some("""
      WITH a AS (
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS s2
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, n, s1 / n AS mean,
             s2 / n - (s1 / n) * (s1 / n) AS var_pop
      FROM a"""))

  /** Pearson correlation from exact decimal co-moments (like
    * stats_moments: partition-order deterministic, unlike corr()'s
    * streaming accumulation). */
  val statsCorr: Q = Q(
    "stats_corr",
    run = (s, dir) => {
      import s.implicits._
      val d4 = DecimalType(28, 4)
      // decimal -> STRING -> double: at sf0.1 the wide sums exceed double's
      // 53-bit mantissa, and Spark/DuckDB round the direct decimal->double
      // conversion differently by 1 ulp (double-rounding through the scale
      // divide). Decimal->string is exact in both engines and
      // string->double is correctly rounded in both — so the detour pins
      // an identical IEEE value on both sides.
      def d2s(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
      Tables.lineitem(s, dir)
        .groupBy($"l_linestatus")
        .agg(
          count(lit(1)).cast("double").as("n"),
          d2s(sum($"l_quantity".cast(dec))).as("sx"),
          d2s(sum($"l_extendedprice".cast(dec))).as("sy"),
          d2s(sum(($"l_quantity".cast(dec) * $"l_quantity".cast(dec)).cast(d4))).as("sxx"),
          d2s(sum(($"l_extendedprice".cast(dec) * $"l_extendedprice".cast(dec)).cast(d4))).as("syy"),
          d2s(sum(($"l_quantity".cast(dec) * $"l_extendedprice".cast(dec)).cast(d4))).as("sxy"))
        .select($"l_linestatus",
          (($"n" * $"sxy" - $"sx" * $"sy") /
            (sqrt($"n" * $"sxx" - $"sx" * $"sx") * sqrt($"n" * $"syy" - $"sy" * $"sy"))).as("corr_qty_price"))
    },
    oracle = Some("""
      WITH a AS (
        SELECT l_linestatus,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY 1)
      SELECT l_linestatus,
             (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
      FROM a"""))

  /** Cube: all grouping-set combinations in one pass. */
  val cubeRevenue: Q = Q(
    "cube_revenue",
    run = (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("ct"),
          sum($"l_quantity".cast(dec)).cast("double").as("qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"ct", $"qty")
    },
    oracle = Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             COUNT(*) AS ct,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** TPC-H Q19 shape: OR-of-ANDs disjunctive predicate across the join —
    * exercises complex predicate normalization/pushdown. */
  val q19Disjunctive: Q = Q(
    "q19_disjunctive_revenue",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val pt = Tables.part(s, dir)
      li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .filter(
          ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 20)) ||
          ($"p_brand" === "Brand#2" && $"p_size".between(10, 30) && $"l_quantity".between(10, 30)) ||
          ($"p_brand" === "Brand#3" && $"p_size".between(20, 50) && $"l_quantity".between(20, 40)))
        .agg(
          sum(($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    },
    oracle = Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_rows
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)"""))

  /** RANGE window frame (value-based, not row-based): per-supplier daily
    * revenue plus the trailing-30-day revenue sum. The frame key is epoch
    * days (numeric) so both engines evaluate the identical RANGE bound;
    * revenue stays DECIMAL-exact inside the frame sum. */
  val windowRangeFrame: Q = Q(
    "window_range_frame",
    run = (s, dir) => {
      import s.implicits._
      val daily = Tables.lineitem(s, dir)
        .groupBy($"l_suppkey", to_date($"l_shipdate").as("ship_dt"))
        .agg(sum($"l_extendedprice".cast(dec)).as("rev"))
        .withColumn("epoch_day", datediff($"ship_dt", lit("1970-01-01").cast("date")).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"l_suppkey").orderBy($"epoch_day")
        .rangeBetween(-30, 0)
      daily.select($"l_suppkey",
        date_format($"ship_dt", "yyyy-MM-dd").as("ship_dt"),
        $"rev".cast("double").as("day_rev"),
        sum($"rev").over(w).cast("double").as("rev_30d"))
    },
    oracle = Some("""
      WITH daily AS (
        SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_dt,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        FROM lineitem GROUP BY 1, 2)
      SELECT l_suppkey, strftime(ship_dt, '%Y-%m-%d') AS ship_dt,
             CAST(rev AS DOUBLE) AS day_rev,
             CAST(SUM(rev) OVER (
               PARTITION BY l_suppkey
               ORDER BY datediff('day', DATE '1970-01-01', ship_dt)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d
      FROM daily"""))

  /** Arbitrary GROUPING SETS (beyond the rollup/cube lattices): detail,
    * one partial, and grand total in one pass. */
  val groupingSets: Q = Q(
    "grouping_sets_revenue",
    run = (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("gs_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS ct
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS ct
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"""))

  /** Ordered-set aggregates: exact discrete percentiles (the element whose
    * cume_dist first reaches p — identical SQL-standard semantics in Spark's
    * percentile_disc and DuckDB's; element selection, no interpolation, so
    * no float-arithmetic divergence). Exact quantiles need a per-group sort
    * at scale — the one deliberately sort-based aggregate in the catalog
    * (approx_percentiles is the sketch-based scale path). */
  val statsQuantiles: Q = Q(
    "stats_quantiles",
    run = (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50_qty"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90_qty"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)").as("p99_price"),
          count(lit(1)).as("ct"))
    },
    oracle = Some("""
      SELECT l_returnflag,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p50_qty,
             CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p90_qty,
             CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS p99_price,
             COUNT(*) AS ct
      FROM lineitem GROUP BY 1"""))

  /** Two-phase salted aggregation (SkewOps.saltedAggregate) — the oracle is
    * the PLAIN group-by, so the hash match proves the salt rewrite is
    * semantics-preserving, not merely plausible. */
  val skewSaltedAgg: Q = Q(
    "skew_salted_agg",
    run = (s, dir) => {
      import graft.operators.SkewOps
      import graft.operators.SkewOps.Agg
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast(dec).as("qty"))
      SkewOps.saltedAggregate(li, Seq("l_returnflag", "l_linestatus"),
        Seq(Agg.sumOf(col("qty"), "qty"), Agg.countAll("ct")))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("qty").cast("double").as("sum_qty"), col("ct"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS ct
      FROM lineitem GROUP BY 1, 2"""))

  /** Salted hot-key join (SkewOps.saltedJoin) — oracle is the plain join,
    * proving the (key, salt) rewrite loses/duplicates no rows. */
  val skewSaltedJoin: Q = Q(
    "skew_salted_join",
    run = (s, dir) => {
      import graft.operators.SkewOps
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir).select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority"))
      SkewOps.saltedJoin(li, ord, "l_orderkey", buckets = 8)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast(dec)).cast("double").as("rev"),
          count(lit(1)).as("ct"))
    },
    oracle = Some("""
      SELECT o_orderpriority,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
             COUNT(*) AS ct
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1"""))

  /** Market-basket co-occurrence: part pairs bought together in >= 2
    * orders. The self-join keys on the ORDER (fan-out bounded by basket
    * size — ≤ 7 lineitems per TPC-H order — never quadratic in the
    * table), the (part, part) count is partial-agged, and dedup of
    * repeated part lines within an order happens BEFORE the pair
    * explosion so a twice-ordered part can't inflate its own pairs. */
  val basketPairs: Q = Q(
    "q23_basket_pairs",
    run = (s, dir) => {
      import s.implicits._
      val items = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_partkey").distinct()
      items.as("a").join(items.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .filter($"n_orders" >= 2)
    },
    oracle = Some("""
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2"""))

  /** Referential-integrity audit: orders → a DELIBERATELY holed customer
    * dim (every 7th key dropped), so the orphan path is live — plus the
    * clean lineitem → orders audit proving ok=TRUE on intact data. One
    * row per audit, union'd. */
  val tAuditFk: Q = Q(
    "t_audit_fk",
    run = (s, dir) => {
      val orders = Tables.orders(s, dir)
      val holed = Tables.customer(s, dir).filter(col("c_custkey") % 7 =!= 0)
      val a = graft.operators.Audit.referentialIntegrity(
          orders, col("o_custkey"), holed, col("c_custkey"))
        .withColumn("audit", lit("orders_to_holed_customers"))
      val b = graft.operators.Audit.referentialIntegrity(
          Tables.lineitem(s, dir), col("l_orderkey"), orders, col("o_orderkey"))
        .withColumn("audit", lit("lineitem_to_orders"))
      a.unionByName(b)
    },
    oracle = Some("""
      WITH holed AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k
                     FROM customer WHERE c_custkey % 7 <> 0),
      o1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_rows,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_orphan_keys
             FROM (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders) c
             WHERE k IS NOT NULL AND k NOT IN (SELECT k FROM holed)),
      b1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_keys
             FROM orders),
      o2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_rows,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_orphan_keys
             FROM (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem) c
             WHERE k IS NOT NULL
               AND k NOT IN (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) FROM orders)),
      b2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
               CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct_keys
             FROM lineitem)
      SELECT b1.n_child, b1.n_null_keys, b1.n_distinct_keys,
             o1.n_orphan_rows, o1.n_orphan_keys,
             (o1.n_orphan_rows = 0 AND b1.n_null_keys = 0) AS ok,
             'orders_to_holed_customers' AS audit
      FROM b1, o1
      UNION ALL
      SELECT b2.n_child, b2.n_null_keys, b2.n_distinct_keys,
             o2.n_orphan_rows, o2.n_orphan_keys,
             (o2.n_orphan_rows = 0 AND b2.n_null_keys = 0) AS ok,
             'lineitem_to_orders' AS audit
      FROM b2, o2"""))

  /** Column-profile audit over orders: exact per-column null/distinct
    * counts, typed min/max rendered after the compare order is fixed —
    * the DESCRIBE-grade snapshot a schema-drift monitor diffs. Doubles
    * excluded by the operator's documented rendering contract. */
  val tAuditColumns: Q = Q(
    "t_audit_columns",
    run = (s, dir) => graft.operators.Audit.columnProfile(
      Tables.orders(s, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")),
    oracle = Some("""
      SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_str FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
             CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
             MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
      UNION ALL
      SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
             MIN(o_orderpriority), MAX(o_orderpriority) FROM orders"""))

  val all: Seq[Q] = Seq(
    q6Revenue, jSemiAnti, setOps, rollupRevenue, windowAnalytics, approxUv,
    q4OrderPriority, q2MinCost, q16SupplierCounts, q22IdleRich,
    pivotStatus, statsMoments, statsCorr, cubeRevenue, q19Disjunctive,
    approxPercentiles, statsQuantiles, groupingSets, windowRangeFrame,
    skewSaltedAgg, skewSaltedJoin, basketPairs, tAuditFk, tAuditColumns)
}
