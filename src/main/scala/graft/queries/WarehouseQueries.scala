package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.tables.Tables

/** Headline warehouse queries over the TPC-H-ish star schema.
  *
  * Money/measure sums go through DECIMAL(18,2) so both Spark and the DuckDB
  * oracle do EXACT arithmetic; the final cast to DOUBLE is then a
  * deterministic, engine-identical conversion (no float-summation-order
  * hash mismatches).
  */
object WarehouseQueries {

  private val dec = DecimalType(18, 2)

  /** TPC-H Q1-style pricing summary (SURVEY §2.5 A1/A4 batch analog:
    * grouped exact sums over measure columns). */
  val q1PricingSummary: Q = Q(
    "q1_pricing_summary",
    run = (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast(dec)).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast(dec)).cast("double").as("sum_base_price"),
          sum(($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus"""),
    headline = true)

  /** TPC-H Q3-style: 3-way join + agg + deterministic top-10
    * (SURVEY §2.4 J1 inner equi-join; sort/limit from §2.7). */
  val q3TopOrders: Q = Q(
    "q3_top_orders",
    run = (s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      // customer is tiny at every SF -> broadcast; orders⋈lineitem shuffles
      // on the join key once, and the aggregate reuses that partitioning.
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(sum(($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec))))
          .cast("double").as("revenue"))
        .select($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"), $"revenue")
        .orderBy($"revenue".desc, $"l_orderkey".asc)
        .limit(10)
    },
    oracle = Some("""
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10"""),
    headline = true)

  /** TPC-H Q5-style: star-schema dim-chain enrichment (SURVEY §2.4 J5/J6 —
    * the async Phoenix/Redis dim chain becomes chained broadcast joins). */
  val q5NationRevenue: Q = Q(
    "q5_nation_revenue",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      // dims are tiny (25 nations / 5 regions / O(sf) suppliers): broadcast
      // the whole chain so the fact table never shuffles before the agg.
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(
          sum(($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    oracle = Some("""
      SELECT r_name, n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name"""),
    headline = true)

  /** TPC-H Q10-style: returned-item revenue per customer, top-20. */
  val q10ReturnedRevenue: Q = Q(
    "q10_returned_revenue",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(sum(($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec))))
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey".asc)
        .limit(20)
    },
    oracle = Some("""
      SELECT c_custkey, c_name, n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey ASC
      LIMIT 20"""))

  /** TPC-H Q12-style: conditional (CASE) aggregation by priority class. */
  val q12PriorityShipping: Q = Q(
    "q12_priority_shipping",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy($"l_linestatus")
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_ct"),
          sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_ct"))
    },
    oracle = Some("""
      SELECT l_linestatus,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_ct,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_ct
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_linestatus"""))

  /** TPC-H Q14-style: ratio of a filtered contribution to the total. */
  val q14PromoShare: Q = Q(
    "q14_promo_share",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val pt = Tables.part(s, dir)
      li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .agg(
          sum(when($"p_type".startsWith("PROMO"),
            ($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec))))
            .otherwise(lit(0).cast(dec))).cast("double").as("promo_revenue"),
          sum(($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec))))
            .cast("double").as("total_revenue"))
        .select(
          // unrounded: round() ties diverge between engines (see
          // TextAnalysis.qualityScore comment); the raw division is
          // bitwise identical
          ($"promo_revenue" / $"total_revenue" * 100).as("promo_pct"),
          $"promo_revenue", $"total_revenue")
    },
    oracle = Some("""
      WITH a AS (
        SELECT
          CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey)
      SELECT promo_revenue / total_revenue * 100 AS promo_pct,
             promo_revenue, total_revenue
      FROM a"""))

  /** TPC-H Q18-style: large orders via HAVING on a grouped subquery. */
  val q18LargeOrders: Q = Q(
    "q18_large_orders",
    run = (s, dir) => {
      import s.implicits._
      val big = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity".cast(dec)).as("qty"))
        .filter($"qty" > 150)
      val ord = Tables.orders(s, dir)
      big.join(ord, $"l_orderkey" === ord("o_orderkey"))
        .select($"o_orderkey", $"o_custkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
          $"qty".cast("double").as("total_qty"))
    },
    oracle = Some("""
      SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             CAST(qty AS DOUBLE) AS total_qty
      FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
            FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150) b
      JOIN orders ON l_orderkey = o_orderkey"""))

  val all: Seq[Q] = Seq(
    q1PricingSummary, q3TopOrders, q5NationRevenue,
    q10ReturnedRevenue, q12PriorityShipping, q14PromoShare, q18LargeOrders)
}
