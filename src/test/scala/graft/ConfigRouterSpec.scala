package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConfigRouter
import graft.operators.ConfigRouter.TableProcess
import graft.tables.Tables

class ConfigRouterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("unrouted source types are dropped (config-driven row filter)") {
    val routed = ConfigRouter.route(spark, Tables.events(spark, dir))
    val sinks = routed.select("sink_table").distinct().collect().map(_.getString(0)).toSet
    assert(sinks === ConfigRouter.defaultRoutes.map(_.sinkTable).toSet)
    val clicks = Tables.events(spark, dir).filter(col("event_type") === "click").count()
    assert(clicks > 0)
    val total = Tables.events(spark, dir).count()
    assert(routed.count() === total - clicks)
  }

  test("payload is pruned to sink_columns") {
    val routed = ConfigRouter.route(spark, Tables.events(spark, dir),
      Seq(TableProcess("purchase", "t", "event_id,value")))
    val keys = routed.select(explode(map_keys(col("payload")))).distinct()
      .collect().map(_.getString(0)).toSet
    assert(keys === Set("event_id", "value"))
  }

  test("Debezium changelog materializes routes: last op wins, delete removes") {
    import spark.implicits._
    import ConfigRouterSpec.TP
    val log = Seq(
      (null.asInstanceOf[TP], TP("purchase", "t_trade", "event_id"), "c", 1L),
      (null.asInstanceOf[TP], TP("view", "t_page", "event_id"), "c", 2L),
      (TP("view", "t_page", "event_id"), null.asInstanceOf[TP], "d", 3L),
      (null.asInstanceOf[TP], TP("purchase", "t_trade_v2", "event_id,value"), "u", 4L),
      (null.asInstanceOf[TP], TP("error", "t_err", "event_id"), "r", 5L))
      .toDF("before", "after", "op", "ts_ms")
    val routes = ConfigRouter.routesFromDebezium(log).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(routes === Set(
      ("purchase", "t_trade_v2", "event_id,value"),
      ("error", "t_err", "event_id")))
  }

  test("config change reroutes without code change (per-batch re-read semantics)") {
    val routed = ConfigRouter.route(spark, Tables.events(spark, dir),
      Seq(TableProcess("click", "dwd_click", "event_id")))
    assert(routed.select("sink_table").distinct().collect().map(_.getString(0)).toSet === Set("dwd_click"))
  }

  test("upsertRoutes accumulates across loads, latest row per pk wins") {
    import spark.implicits._
    val db = "graft_upsert_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val routes = Seq(TableProcess("purchase", "dim_trade", "event_id,user_id"))
    def load(rows: (Long, Long)*): Unit = {
      ConfigRouter.upsertRoutes(spark,
        rows.toSeq.toDF("event_id", "user_id").withColumn("event_type", lit("purchase")),
        routes, dbName = db)
      ()
    }
    load(1L -> 10L, 2L -> 20L)
    load(2L -> 21L, 3L -> 30L) // pk 2 replaced, pk 1 RETAINED, pk 3 added
    val got = spark.table(s"$db.dim_trade").collect()
      .map(r => r.getString(0).toLong -> r.getString(1).toLong).toMap
    assert(got === Map(1L -> 10L, 2L -> 21L, 3L -> 30L))
    // a snapshot load of the same second batch would have dropped pk 1 —
    // the distinction the DIM contract (Phoenix upsert) requires
  }

  test("upsertRoutes in foreachBatch: dim state accumulates across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val db = "graft_upsert_stream"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val routes = Seq(TableProcess("purchase", "dim_trade", "event_id,user_id"))
    val stream = MemoryStream[(Long, Long, String)]
    val q = stream.toDF().toDF("event_id", "user_id", "event_type")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        ConfigRouter.upsertRoutes(spark, batch.toDF(), routes, dbName = db)
        ()
      }.start()
    stream.addData((1L, 10L, "purchase"), (2L, 20L, "purchase")); q.processAllAvailable()
    stream.addData((2L, 21L, "purchase"), (3L, 30L, "purchase")); q.processAllAvailable()
    q.stop()
    val got = spark.table(s"$db.dim_trade").collect()
      .map(r => r.getString(0).toLong -> r.getString(1).toLong).toMap
    assert(got === Map(1L -> 10L, 2L -> 21L, 3L -> 30L))
  }

  test("orphan reclamation requires the create-time sentinel (foreign data is safe)") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val db = "graft_orphan_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    fs.delete(new org.apache.hadoop.fs.Path(warehouse, s"$db.db"), true)
    spark.sql(s"CREATE DATABASE `$db`")
    def junk(table: String): org.apache.hadoop.fs.Path = {
      val f = new org.apache.hadoop.fs.Path(warehouse, s"$db.db/$table/foreign.txt")
      val out = fs.create(f); out.writeBytes("not ours"); out.close(); f
    }
    import spark.implicits._
    val events = Seq((1L, "purchase")).toDF("event_id", "event_type")

    // location occupied + sentinel present (a previous graft session's
    // orphan): reclaimed, create succeeds
    val marked = junk("dim_marked")
    fs.mkdirs(new org.apache.hadoop.fs.Path(warehouse, s"$db.db/.graft_created/dim_marked"))
    ConfigRouter.materializeRoutes(spark, events,
      Seq(TableProcess("purchase", "dim_marked", "event_id")), dbName = db)
    assert(!fs.exists(marked) && spark.catalog.tableExists(s"$db.dim_marked"))

    // location occupied, NO sentinel (another tenant's data): the create
    // fails loudly and the foreign file is untouched
    val foreign = junk("dim_foreign")
    intercept[Exception] {
      ConfigRouter.materializeRoutes(spark, events,
        Seq(TableProcess("purchase", "dim_foreign", "event_id")), dbName = db)
    }
    assert(fs.exists(foreign))
  }
}

object ConfigRouterSpec {
  case class TP(source_type: String, sink_table: String, sink_columns: String)
}

/** J3/S5 freshness contract: the static/config side is re-read every
  * micro-batch, so a config change between batches reroutes mid-stream
  * (the lookup-join TTL semantics of MySqlUtil.java:20-21, with
  * freshness = one micro-batch instead of 1h). */
class ConfigFreshnessSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("config change between micro-batches reroutes the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.ConfigRouter
    import graft.operators.ConfigRouter.TableProcess

    val cfgPath = "/tmp/graft_test_cfg"
    def writeCfg(routes: Seq[TableProcess]): Unit =
      ConfigRouter.configDf(spark, routes).write.mode("overwrite").parquet(cfgPath)

    writeCfg(Seq(TableProcess("purchase", "sink_v1", "event_id")))
    val sink = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("event_id", "event_type")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // re-read config each batch — the freshness mechanism under test
        val routes = spark.read.parquet(cfgPath).as[(String, String, String)]
          .collect().map(r => TableProcess(r._1, r._2, r._3)).toSeq
        val routed = ConfigRouter.route(spark, batch.toDF(), routes)
        sink.synchronized {
          sink ++= routed.groupBy("sink_table").count()
            .collect().map(r => r.getString(0) -> r.getLong(1))
        }
        ()
      }.start()
    stream.addData((1L, "purchase"), (2L, "purchase")); q.processAllAvailable()
    writeCfg(Seq(TableProcess("purchase", "sink_v2", "event_id")))
    stream.addData((3L, "purchase")); q.processAllAvailable()
    q.stop()
    assert(sink.toSet === Set("sink_v1" -> 2L, "sink_v2" -> 1L))
  }

  test("K6 streaming: per-batch DDL tracks a config change (new route => new table)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.ConfigRouter
    import graft.operators.ConfigRouter.TableProcess
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val db = "graft_k6_stream"
    val cfgPath = "/tmp/graft_test_k6cfg"
    def writeCfg(routes: Seq[TableProcess]): Unit =
      ConfigRouter.configDf(spark, routes).write.mode("overwrite").parquet(cfgPath)
    writeCfg(Seq(TableProcess("purchase", "k6s_trade", "event_id,user_id")))
    val stream = MemoryStream[(Long, Long, String)]
    val q = stream.toDF().toDF("event_id", "user_id", "event_type")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // the reference's runtime-config semantics: re-read config AND run
        // the DDL path per micro-batch — a route added mid-stream
        // materializes its table on the next batch
        val routes = spark.read.parquet(cfgPath).as[(String, String, String)]
          .collect().map(r => TableProcess(r._1, r._2, r._3)).toSeq
        ConfigRouter.materializeRoutes(spark, batch.toDF(), routes, dbName = db)
        ()
      }.start()
    stream.addData((1L, 10L, "purchase"), (2L, 11L, "signup")); q.processAllAvailable()
    assert(spark.catalog.tableExists(s"$db.k6s_trade"))
    assert(!spark.catalog.tableExists(s"$db.k6s_signup"))
    // config change at runtime: add a route for signup
    writeCfg(Seq(
      TableProcess("purchase", "k6s_trade", "event_id,user_id"),
      TableProcess("signup", "k6s_signup", "event_id")))
    stream.addData((3L, 12L, "purchase"), (4L, 13L, "signup")); q.processAllAvailable()
    q.stop()
    assert(spark.catalog.tableExists(s"$db.k6s_signup"))
    // INSERT OVERWRITE per batch => tables hold the LAST batch's routing
    assert(spark.table(s"$db.k6s_signup").collect().map(_.getString(0)).toSeq === Seq("4"))
    assert(spark.table(s"$db.k6s_trade").collect().map(_.getString(0)).toSeq === Seq("3"))
  }

  test("K6 dynamic DDL: creates managed tables, idempotent on re-run") {
    import graft.operators.ConfigRouter
    import graft.tables.Tables
    val events = Tables.events(spark, SparkTestSession.sf0001)
    val db = "graft_k6_spec"
    val s1 = ConfigRouter.materializeRoutes(spark, events, dbName = db)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // tables really exist in the catalog with the declared all-STRING schema
    assert(spark.catalog.tableExists(s"$db.dwd_trade_order"))
    assert(spark.table(s"$db.dwd_trade_order").schema.fields
      .forall(_.dataType === org.apache.spark.sql.types.StringType))
    // re-run: CREATE TABLE IF NOT EXISTS + INSERT OVERWRITE → same counts
    val s2 = ConfigRouter.materializeRoutes(spark, events, dbName = db)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(s1 === s2 && s1.nonEmpty)
    // counts match the routed fan-out
    val want = ConfigRouter.route(spark, events)
      .groupBy("sink_table").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.map(t => t._1 -> t._2).toMap === want)
    // route schema change: the table is recreated with the new columns and
    // values land under the RIGHT names (insertInto is positional — a
    // stale schema would silently transpose columns)
    import graft.operators.ConfigRouter.TableProcess
    val changed = Seq(TableProcess("purchase", "dwd_trade_order", "event_id,props"))
    ConfigRouter.materializeRoutes(spark, events, changed, dbName = db)
    val t = spark.table(s"$db.dwd_trade_order")
    assert(t.columns.toSeq === Seq("event_id", "props"))
    val wantProps = events.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select(org.apache.spark.sql.functions.col("props").cast("string"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(t.select("props").collect().map(_.getString(0)).sorted.toSeq === wantProps)
  }
}
