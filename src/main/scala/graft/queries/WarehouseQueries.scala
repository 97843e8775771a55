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

  /** TPC-H Q13-style: customer order-count distribution (left join
    * preserving zero-order customers, then a histogram over the counts). */
  val q13OrderDistribution: Q = Q(
    "q13_order_distribution",
    run = (s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
    },
    oracle = Some("""
      SELECT c_count, COUNT(*) AS custdist
      FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY 1) t
      GROUP BY 1"""))

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

  /** Deterministic synthetic `partsupp` derived from lineitem — the driver's
    * testdata has no partsupp table, so both engines derive the IDENTICAL
    * table from the same pinned integer arithmetic over the join keys: one
    * row per distinct (l_partkey, l_suppkey), availqty in [1,1000], supply
    * cost carried as integer cents (exact in both engines; divided to
    * currency only at the final DOUBLE projection). */
  private def partsupp(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_partkey".as("ps_partkey"), $"l_suppkey".as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty", ($"ps_partkey" * 7 + $"ps_suppkey" * 3) % 1000 + 1)
      .withColumn("ps_cost_cents", ($"ps_partkey" * 13 + $"ps_suppkey" * 5) % 10000 + 100)
  }

  private val partsuppSql = """
      ps0 AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem),
      partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               (ps_partkey*7 + ps_suppkey*3) % 1000 + 1 AS ps_availqty,
               (ps_partkey*13 + ps_suppkey*5) % 10000 + 100 AS ps_cost_cents
        FROM ps0)"""

  /** TPC-H Q11-style: important stock — per-part inventory value for one
    * nation's suppliers, kept where above a fraction of the nation total.
    * Value sums run in exact integer cents; the fraction threshold compare
    * happens on exact-in-double magnitudes (integers < 2^53). */
  val q11ImportantStock: Q = Q(
    "q11_important_stock",
    run = (s, dir) => {
      import s.implicits._
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir).filter($"n_name" === "NATION_3")
      // dims broadcast; the only shuffle is the partkey aggregation
      val v = partsupp(s, dir)
        .join(broadcast(sup), $"ps_suppkey" === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .groupBy($"ps_partkey")
        .agg(sum($"ps_cost_cents" * $"ps_availqty").as("vc"))
      val total = v.agg(sum($"vc").as("tot"))
      v.crossJoin(broadcast(total))
        .filter($"vc" > $"tot" * lit(0.0001))
        .select($"ps_partkey", ($"vc".cast("double") / 100).as("value"))
    },
    oracle = Some(s"""
      WITH $partsuppSql,
      v AS (
        SELECT ps_partkey, SUM(ps_cost_cents * ps_availqty) AS vc
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY 1)
      SELECT ps_partkey, CAST(vc AS DOUBLE) / 100 AS value
      FROM v WHERE CAST(vc AS DOUBLE) > (SELECT CAST(SUM(vc) AS DOUBLE) * 0.0001 FROM v)"""))

  /** TPC-H Q20-style: suppliers whose synthetic stock of 'red' parts exceeds
    * half of what they shipped in 1996 (semi-join reduction to a distinct
    * supplier set, then dim enrichment). Quantity sums exact in DECIMAL. */
  val q20ExcessStock: Q = Q(
    "q20_excess_stock_suppliers",
    run = (s, dir) => {
      import s.implicits._
      val shipped = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(sum($"l_quantity".cast(dec)).as("qty"))
      val redParts = Tables.part(s, dir).filter($"p_name".startsWith("red"))
      val cand = partsupp(s, dir)
        .join(broadcast(redParts), $"ps_partkey" === $"p_partkey")
        .join(shipped, $"ps_partkey" === $"l_partkey" && $"ps_suppkey" === $"l_suppkey")
        .filter($"ps_availqty".cast(dec) > lit(0.5).cast(dec) * $"qty")
        .select($"ps_suppkey").distinct()
      cand
        .join(broadcast(Tables.supplier(s, dir)), $"ps_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"n_name")
    },
    oracle = Some(s"""
      WITH $partsuppSql,
      shipped AS (
        SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT ps_suppkey
        FROM partsupp
        JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'red%'
        JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        WHERE CAST(ps_availqty AS DECIMAL(18,2)) > CAST(0.5 AS DECIMAL(18,2)) * qty)
      SELECT s_suppkey, s_name, n_name
      FROM cand JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey"""))

  /** TPC-H Q7-style: shipping volume between two nations by year (two
    * aliases of the same dim table with a disjunctive pair predicate). */
  val q7VolumeShipping: Q = Q(
    "q7_volume_shipping",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val n1 = Tables.nation(s, dir).select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation"))
      val n2 = Tables.nation(s, dir).select($"n_nationkey".as("n2_key"), $"n_name".as("cust_nation"))
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(n1), sup("s_nationkey") === $"n1_key")
        .join(broadcast(n2), cust("c_nationkey") === $"n2_key")
        .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_8") ||
          ($"supp_nation" === "NATION_8" && $"cust_nation" === "NATION_3"))
        .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").cast("long").as("l_year"))
        .agg(sum(($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec))))
          .cast("double").as("revenue"))
    },
    oracle = Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
         OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
      GROUP BY 1, 2, 3"""))

  /** TPC-H Q8-style: one nation's market share of a region's revenue per
    * year — conditional-sum ratio (division only at the final DOUBLE
    * projection, numerators/denominators exact). */
  val q8MarketShare: Q = Q(
    "q8_market_share",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir).filter($"r_name" === "EUROPE")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(year($"l_shipdate").cast("long").as("l_year"))
        .agg(
          sum(when($"n_name" === "NATION_3",
            $"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)))
            .otherwise(lit(0).cast(dec))).cast("double").as("nation_revenue"),
          sum($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)))
            .cast("double").as("region_revenue"))
        .select($"l_year", ($"nation_revenue" / $"region_revenue").as("mkt_share"),
          $"nation_revenue", $"region_revenue")
    },
    oracle = Some("""
      WITH a AS (
        SELECT year(l_shipdate) AS l_year,
               CAST(SUM(CASE WHEN n_name = 'NATION_3'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_revenue,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS region_revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY 1)
      SELECT l_year, nation_revenue / region_revenue AS mkt_share,
             nation_revenue, region_revenue
      FROM a"""))

  /** TPC-H Q9-style: product-line profit by nation and year. Profit runs in
    * exact integer cents (100·revenue − cost_cents·qty, all DECIMAL) and
    * divides to currency only in the final DOUBLE projection. */
  val q9ProductProfit: Q = Q(
    "q9_product_profit",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val pt = Tables.part(s, dir).filter($"p_name".contains("widget"))
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir)
      li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .join(partsupp(s, dir),
          li("l_partkey") === $"ps_partkey" && li("l_suppkey") === $"ps_suppkey")
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .groupBy($"n_name", year($"l_shipdate").cast("long").as("l_year"))
        .agg(sum(
          $"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)) * 100
            - $"ps_cost_cents" * $"l_quantity".cast(dec))
          .cast("double").as("profit_cents"))
        .select($"n_name", $"l_year", ($"profit_cents" / 100).as("profit"))
    },
    oracle = Some(s"""
      WITH $partsuppSql
      SELECT n_name, year(l_shipdate) AS l_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * 100
                      - ps_cost_cents * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / 100 AS profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2"""))

  /** TPC-H Q15-style: top supplier(s) by 1996 revenue — scalar-max subquery
    * over a shared aggregate (exact DECIMAL equality, no float compare). */
  val q15TopSupplier: Q = Q(
    "q15_top_supplier",
    run = (s, dir) => {
      import s.implicits._
      val rev = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(sum($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)))
          .as("rev"))
      val top = rev.agg(max($"rev").as("max_rev"))
      rev.crossJoin(broadcast(top))
        .filter($"rev" === $"max_rev")
        .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", $"rev".cast("double").as("total_revenue"))
    },
    oracle = Some("""
      WITH rev AS (
        SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev = (SELECT MAX(rev) FROM rev)"""))

  /** TPC-H Q17-style: revenue from small-quantity orders. The avg-quantity
    * threshold `qty < 0.2·avg(qty)` is rewritten division-free as
    * `5·qty·cnt < sum_qty` so both engines compare exact DECIMALs instead
    * of engine-specific AVG scales. */
  val q17SmallQuantity: Q = Q(
    "q17_small_quantity",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val pt = Tables.part(s, dir).filter($"p_brand" === "Brand#1")
      val stats = li.groupBy($"l_partkey".as("sp_partkey"))
        .agg(sum($"l_quantity".cast(dec)).as("sum_qty"), count(lit(1)).as("cnt"))
      li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .join(stats, li("l_partkey") === $"sp_partkey")
        .filter($"l_quantity".cast(dec) * 5 * $"cnt" < $"sum_qty")
        .agg(sum($"l_extendedprice".cast(dec)).cast("double").as("small_qty_revenue"),
          count(lit(1)).as("n_lines"))
    },
    oracle = Some("""
      WITH stats AS (
        SELECT l_partkey AS sp_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1)
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
             COUNT(*) AS n_lines
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN stats ON l_partkey = sp_partkey
      WHERE p_brand = 'Brand#1'
        AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty"""))

  /** TPC-H Q21 SHAPE analog — suppliers who alone shipped late on
    * multi-supplier orders. The original needs l_commitdate/l_receiptdate
    * (absent from the testdata); "late" is re-pinned as shipped > 90 days
    * after o_orderdate, which preserves the query's defining structure:
    * a correlated EXISTS + NOT EXISTS pair that Catalyst decorrelates
    * into semi/anti joins. */
  val q21LateSupplier: Q = Q(
    "q21_late_supplier",
    run = (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("q21_lineitem")
      Tables.orders(s, dir).createOrReplaceTempView("q21_orders")
      Tables.supplier(s, dir).createOrReplaceTempView("q21_supplier")
      s.sql("""
        SELECT s_suppkey, s_name, COUNT(*) AS numwait
        FROM q21_lineitem l1
        JOIN q21_orders o ON o.o_orderkey = l1.l_orderkey
        JOIN q21_supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
            SELECT 1 FROM q21_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM q21_lineitem l3
            JOIN q21_orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_suppkey, s_name""")
    },
    oracle = Some("""
      SELECT s_suppkey, s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      JOIN supplier s ON l1.l_suppkey = s.s_suppkey
      WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
      GROUP BY s_suppkey, s_name"""))

  val all: Seq[Q] = Seq(
    q1PricingSummary, q3TopOrders, q5NationRevenue,
    q7VolumeShipping, q8MarketShare, q9ProductProfit,
    q10ReturnedRevenue, q11ImportantStock, q12PriorityShipping,
    q13OrderDistribution, q14PromoShare, q15TopSupplier, q17SmallQuantity,
    q18LargeOrders, q20ExcessStock, q21LateSupplier)
}
