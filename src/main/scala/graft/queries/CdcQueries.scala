package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.model.Envelopes
import graft.tables.Tables

/** CDC-ingestion surface (SURVEY §2.1 S3/S4, §2.2 K3, §2.4 J1/J2):
  * Maxwell envelope round-trip, changelog upsert compaction, and the
  * wide multi-join. Envelopes are synthesized from the `orders` table
  * in-query (no extra testdata); the oracle computes the same result
  * directly from the base table, so the wrap→parse→route path must be
  * a faithful identity to pass.
  */
object CdcQueries {

  private val dec = DecimalType(18, 2)

  /** S3+P2+P4: wrap orders as Maxwell JSON, parse, filter changelog types,
    * project the MAP payload, aggregate. Type is derived from order status
    * (O→insert, F→update, P→bootstrap-insert) so the filter is non-trivial. */
  val s3MaxwellRoundtrip: Q = Q(
    "s3_maxwell_roundtrip",
    run = (s, dir) => {
      import s.implicits._
      val ord = Tables.orders(s, dir)
      val typeCol = when($"o_orderstatus" === "O", "insert")
        .when($"o_orderstatus" === "F", "update")
        .otherwise("bootstrap-insert")
      val raw = ord.select(
        Envelopes.toMaxwellJson(ord, "orders", typeCol, unix_timestamp($"o_orderdate")).as("value"))
      val env = raw.select(Envelopes.parseMaxwell($"value").as("m")).select("m.*")
      env
        .filter($"type".isin("insert", "update", "bootstrap-insert"))
        .filter($"data".isNotNull)
        .select($"type", $"data"("o_orderkey").cast("long").as("okey"),
          $"data"("o_totalprice").cast(dec).as("total"))
        .groupBy($"type")
        .agg(count(lit(1)).as("ct"),
          min($"okey").as("min_key"),
          sum($"total").cast("double").as("sum_total"))
    },
    oracle = Some("""
      SELECT CASE o_orderstatus WHEN 'O' THEN 'insert' WHEN 'F' THEN 'update'
                  ELSE 'bootstrap-insert' END AS type,
             COUNT(*) AS ct, MIN(o_orderkey) AS min_key,
             CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      FROM orders GROUP BY 1"""))

  /** K3/K5: changelog upsert compaction — latest-row-wins by (key, version),
    * the Delta-MERGE absorption of the reference's upsert-kafka retractions
    * (DwdTradeOrderDetail.java:173-212). The changelog is orders v1 plus a
    * deterministic v2 update for every 3rd order. */
  val k3UpsertCompact: Q = Q(
    "k3_upsert_compact",
    run = (s, dir) => {
      import s.implicits._
      val ord = Tables.orders(s, dir)
      val v1 = ord.select($"o_orderkey", $"o_orderstatus", $"o_totalprice", lit(1L).as("version"))
      val v2 = ord.filter($"o_orderkey" % 3 === 0)
        .select($"o_orderkey", lit("F").as("o_orderstatus"),
          ($"o_totalprice" * 2).as("o_totalprice"), lit(2L).as("version"))
      val changelog = v1.unionByName(v2)
      val w = Window.partitionBy($"o_orderkey").orderBy($"version".desc)
      changelog
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_orderkey", $"o_orderstatus",
          $"o_totalprice".cast(dec).cast("double").as("total"), $"version")
    },
    oracle = Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
             CAST(CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2 ELSE o_totalprice END
                  AS DECIMAL(18,2)) AS DOUBLE) AS total,
             CAST(CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS version
      FROM orders"""))

  /** K3 at fact scale: the bucket-partitioned MERGE stand-in
    * (sinks.BucketedUpsert) applied as two change waves — full snapshot,
    * then an update wave over every third key — and read back. The oracle
    * reproduces the final latest-per-key state directly, so the hash
    * match proves the touched-buckets-only rewrite loses and duplicates
    * nothing. (The companion spec asserts the I/O property itself:
    * untouched bucket directories are byte-identical after wave 2.) */
  val k3BucketedUpsert: Q = Q(
    "k3_bucketed_upsert",
    run = (s, dir) => {
      import s.implicits._
      // fresh per run (re-upserting v1 over retained v2 state would keep
      // v2 and break the oracle), self-cleaning at JVM exit (ScratchDirs)
      val path = graft.ScratchDirs.fresh("k3_bucketed") + "/t"
      val ord = Tables.orders(s, dir)
      val v1 = ord.select($"o_orderkey", $"o_orderstatus",
        $"o_totalprice".cast(dec).cast("double").as("total"), lit(1L).as("version"))
      val v2 = ord.filter($"o_orderkey" % 3 === 0)
        .select($"o_orderkey", lit("F").as("o_orderstatus"),
          ($"o_totalprice" * 2).cast(dec).cast("double").as("total"), lit(2L).as("version"))
      graft.sinks.BucketedUpsert.upsert(v1, path, "o_orderkey", "version", nBuckets = 16)
      graft.sinks.BucketedUpsert.upsert(v2, path, "o_orderkey", "version", nBuckets = 16)
      graft.sinks.BucketedUpsert.read(s, path)
    },
    oracle = Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
             CAST(CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2 ELSE o_totalprice END
                  AS DECIMAL(18,2)) AS DOUBLE) AS total,
             CAST(CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS version
      FROM orders"""))

  /** J1: the wide order-detail join (DwdTradeOrderDetail.java:123-169
    * 5-way shape): lineitem ⋈ orders ⋈ customer + broadcast part/supplier.
    * Row-level output, filtered to a deterministic key slice. */
  val j1WideJoin: Q = Q(
    "j1_wide_join",
    run = (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir).filter($"l_orderkey" % 50 === 0)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val pt = Tables.part(s, dir)
      val sup = Tables.supplier(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(pt), li("l_partkey") === pt("p_partkey"), "left")
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "left")
        .select(
          $"l_orderkey", $"l_linenumber", $"c_name", $"c_mktsegment",
          $"o_orderstatus", $"p_brand", $"s_name",
          ($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)))
            .cast("double").as("revenue"))
    },
    oracle = Some("""
      SELECT l_orderkey, l_linenumber, c_name, c_mktsegment,
             o_orderstatus, p_brand, s_name,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      LEFT JOIN part ON l_partkey = p_partkey
      LEFT JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_orderkey % 50 = 0"""),
    headline = true)

  val all: Seq[Q] = Seq(s3MaxwellRoundtrip, k3UpsertCompact, k3BucketedUpsert, j1WideJoin)
}
