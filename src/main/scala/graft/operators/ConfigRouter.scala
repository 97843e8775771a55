package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven record router — the Spark-first re-expression of the
  * reference's broadcast-state DIM/DWD fan-out
  * (DimApp.java:84-99, DIM_MyBroadcastFunction.java:61-231,
  * DWD_MyBroadcastFunction.java:20-168):
  *
  *  - row filter  = inner join against the (broadcast) config table —
  *    records whose source has no route are dropped (P8);
  *  - column prune = `map_filter` of the payload map down to
  *    `sink_columns` (P9);
  *  - dynamic routing = a `sink_table` column on every output row, the
  *    exact mechanism Spark's Kafka sink uses for per-record topics (K2).
  *
  * At scale the config side is tiny (a control table) so the join is a
  * broadcast-hash join: the fact stream never shuffles. In streaming, the
  * same function runs inside foreachBatch with the config re-read per
  * micro-batch (= the reference's "config can change at runtime" semantics).
  */
object ConfigRouter {

  /** A route rule: which source records, where they go, which columns stay. */
  final case class TableProcess(sourceType: String, sinkTable: String, sinkColumns: String)

  /** Default route table for the events stream (mirrors the gmall
    * table_process rows; `click` has no route on purpose — config-driven drop). */
  val defaultRoutes: Seq[TableProcess] = Seq(
    TableProcess("purchase", "dwd_trade_order", "event_id,user_id,value"),
    TableProcess("signup", "dwd_user_register", "event_id,user_id"),
    TableProcess("view", "dwd_traffic_page", "event_id,user_id,props"),
    TableProcess("error", "dwd_error_log", "event_id,props"))

  def configDf(spark: SparkSession, routes: Seq[TableProcess]): DataFrame = {
    import spark.implicits._
    routes.toDF("source_type", "sink_table", "sink_columns")
  }

  /** Materialize the route table from a Debezium changelog of TableProcess
    * rows (FIXTURES.md §3; DIM_MyBroadcastFunction.java:104-109): per
    * source_type the LATEST op wins (ts_ms order); `op = 'd'` (whose
    * payload is in `before`) removes the route; c/u/r upsert from `after`.
    */
  def routesFromDebezium(changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = changelog.withColumn("source_type",
      when(col("op") === "d", col("before.source_type")).otherwise(col("after.source_type")))
    // deterministic tiebreak for ops sharing a ts_ms (common in CDC —
    // ts_ms is millisecond-granular): deletes rank after upserts, then a
    // stable payload hash totals the order. Without this, same-ms 'u'/'d'
    // pairs resolve per-partition-arbitrarily and the route flaps.
    val w = Window.partitionBy(col("source_type"))
      .orderBy(col("ts_ms").desc,
        when(col("op") === "d", 1).otherwise(0).asc, col("op").asc,
        xxhash64(to_json(struct(col("before"), col("after")))).asc)
    keyed
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("op") =!= "d")
      .select(col("source_type"), col("after.sink_table").as("sink_table"),
        col("after.sink_columns").as("sink_columns"))
  }

  /** K6 — dynamic DDL, SNAPSHOT semantics: materialize the routed frame
    * into per-route MANAGED tables, creating each on the fly
    * (`CREATE TABLE IF NOT EXISTS`, every payload column STRING — the
    * reference's all-varchar create-on-the-fly contract,
    * DIM_MyBroadcastFunction.java:138-200) and re-loading it with
    * INSERT OVERWRITE. Each call REPLACES every routed table's contents
    * with this input's routing — re-running a batch never duplicates
    * rows, but in per-micro-batch streaming use each table holds only the
    * LAST batch (a materialized view of the current input, not an
    * accumulating store). For the reference's upsert-into-Phoenix
    * contract — rows ACCUMULATE across batches, latest row per primary
    * key wins (DIM_SinkFunction.java:28-92) — use [[upsertRoutes]].
    *
    * Returns one row per route read back FROM THE CATALOG
    * (sink_table, n_rows, n_cols) — the observable proof that the tables
    * exist with the declared schema. The per-route loop is control-plane
    * work over the (tiny) config table; the data path is one routed scan
    * per sink, all executor-side.
    */
  def materializeRoutes(
      spark: SparkSession,
      events: DataFrame,
      routes: Seq[TableProcess] = defaultRoutes,
      dbName: String = "graft_dwd"): DataFrame = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$dbName`")
    val routed = route(spark, events, routes).persist()
    try {
      routes.foreach { tp =>
        val cols = tp.sinkColumns.split(",").map(_.trim)
        ensureTable(spark, dbName, tp.sinkTable, cols.toIndexedSeq)
        routed.filter(col("sink_table") === tp.sinkTable)
          .select(cols.map(c => element_at(col("payload"), c).as(c)).toIndexedSeq: _*)
          .write.mode("overwrite").insertInto(s"$dbName.${tp.sinkTable}")
        // the session caches the table's file listing; after the overwrite
        // replaced the files a stale listing fails the read-back (and any
        // later batch) with FILE_NOT_EXIST
        spark.catalog.refreshTable(s"$dbName.${tp.sinkTable}")
      }
    } finally { routed.unpersist(); () }
    readBack(spark, routes, dbName)
  }

  /** K5/K6 — dynamic DDL, UPSERT semantics: the reference's DIM-layer
    * contract (Phoenix `UPSERT INTO` keyed by the row's primary key,
    * DIM_SinkFunction.java:28-92): rows ACCUMULATE across calls/batches,
    * and a new row REPLACES the stored row with the same `pk` (last write
    * wins; within one input, ties on pk break by a stable row hash so the
    * merge is deterministic). Tables are created on the fly exactly as
    * [[materializeRoutes]] does — all-STRING, schema-drift recreate.
    *
    * Mechanics per route: union the stored table with the new rows, keep
    * row_number()=1 per pk (new side first), overwrite. The merged plan
    * reads the very table it overwrites, which Spark's overwrite check
    * rejects — localCheckpoint materializes the merge to blocks and
    * truncates the file-source lineage, making the swap legal; the
    * table stays readable because insertInto replaces files at the end.
    * DIM tables are the SMALL side by design at any scale (the reference
    * keeps them in Phoenix/Redis, not Kafka), so the per-batch
    * read+merge+rewrite is bounded by dim size, not stream volume; with
    * Delta on the cluster the body becomes one transactional MERGE INTO.
    */
  def upsertRoutes(
      spark: SparkSession,
      events: DataFrame,
      routes: Seq[TableProcess] = defaultRoutes,
      dbName: String = "graft_dim",
      pk: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$dbName`")
    val routed = route(spark, events, routes).persist()
    try {
      routes.foreach { tp =>
        val cols = tp.sinkColumns.split(",").map(_.trim)
        require(cols.contains(pk),
          s"upsert route ${tp.sinkTable}: pk '$pk' must be one of sink_columns '${tp.sinkColumns}'")
        val qualified = s"$dbName.${tp.sinkTable}"
        ensureTable(spark, dbName, tp.sinkTable, cols.toIndexedSeq)
        val newRows = routed.filter(col("sink_table") === tp.sinkTable)
          .select(cols.map(c => element_at(col("payload"), c).as(c)).toIndexedSeq: _*)
        val merged = newRows.withColumn("__src", lit(1))
          .unionByName(spark.table(qualified).withColumn("__src", lit(0)))
          .withColumn("__rn", row_number().over(Window.partitionBy(col(pk))
            .orderBy(col("__src").desc,
              xxhash64(struct(cols.map(col).toIndexedSeq: _*)).asc)))
          .filter(col("__rn") === 1).drop("__rn", "__src")
        val snap = merged.localCheckpoint(true)
        try {
          snap.write.mode("overwrite").insertInto(qualified)
          spark.catalog.refreshTable(qualified)
        } finally { snap.unpersist(blocking = false); () }
      }
    } finally { routed.unpersist(); () }
    readBack(spark, routes, dbName)
  }

  /** Create-on-the-fly shared by snapshot and upsert loads: drop+recreate
    * on schema drift, reclaim ONLY self-created orphan locations, create
    * all-STRING, and stamp the sentinel that marks the location as ours. */
  private def ensureTable(
      spark: SparkSession, dbName: String, table: String, cols: Seq[String]): Unit = {
    val qualified = s"$dbName.$table"
    // a route's sink_columns can change between runs; insertInto is
    // POSITIONAL, so writing the new projection into a stale-schema
    // table would silently land values under wrong columns. The
    // reference's contract is all-varchar create-on-the-fly — drop +
    // recreate is the schema migration (loss-free for snapshot loads;
    // for upsert loads drift resets accumulation, as the reference's
    // recreate does).
    if (spark.catalog.tableExists(qualified) &&
        spark.table(qualified).columns.toSeq != cols)
      spark.sql(s"DROP TABLE `$dbName`.`$table`")
    if (!spark.catalog.tableExists(qualified)) {
      // the default (non-Hive) catalog is session-scoped while the
      // warehouse directory persists: a location left by a previous
      // session is an orphan the catalog no longer knows, and the
      // managed-table create rejects a non-empty location. Reclaim it
      // ONLY when our create-time sentinel proves a previous graft
      // session created it — a bare path heuristic cannot tell an orphan
      // from another tenant's live managed table or from a mis-derived
      // path under a custom-LOCATION database, and deleting those
      // destroys someone else's data. Without the sentinel the CREATE
      // fails loudly on the non-empty location, which is the safe
      // outcome. The sentinel lives OUTSIDE the table directory (dot-dir
      // sibling) so INSERT OVERWRITE's file replacement can't wipe it.
      // Resolve the filesystem FROM the warehouse URI (the warehouse
      // can be hdfs/s3a at cluster scale, not the driver's local disk).
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(warehouse, s"$dbName.db/$table")
      val marker = new org.apache.hadoop.fs.Path(
        warehouse, s"$dbName.db/.graft_created/$table")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc) && fs.exists(marker)) fs.delete(loc, true)
      val colDefs = cols.map(c => s"`$c` STRING").mkString(", ")
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS `$dbName`.`$table` ($colDefs) USING PARQUET")
      fs.mkdirs(marker)
    }
  }

  private def readBack(
      spark: SparkSession, routes: Seq[TableProcess], dbName: String): DataFrame = {
    import spark.implicits._
    routes.map { tp =>
      val t = spark.table(s"$dbName.${tp.sinkTable}")
      (tp.sinkTable, t.count(), t.columns.length.toLong)
    }.toDF("sink_table", "n_rows", "n_cols")
  }

  /** Route `events`: returns one row per routed record with
    * (sink_table, payload) where payload is the column-pruned MAP. */
  def route(spark: SparkSession, events: DataFrame, routes: Seq[TableProcess] = defaultRoutes): DataFrame = {
    val cfg = configDf(spark, routes)
    val payload: Column = map(
      events.columns.filter(_ != "event_type").flatMap(c =>
        Seq(lit(c), col(c).cast("string"))).toIndexedSeq: _*)
    events
      .join(broadcast(cfg), events("event_type") === cfg("source_type"))
      // trim entries: materializeRoutes/upsertRoutes trim their split of
      // the SAME config string — an untrimmed " user_id" here would prune
      // the key from the payload while the DDL side creates the column,
      // silently loading it all-NULL
      .withColumn("kept", transform(split(col("sink_columns"), ","), trim(_)))
      .select(
        col("sink_table"),
        map_filter(payload, (k, _) => array_contains(col("kept"), k)).as("payload"))
  }
}
