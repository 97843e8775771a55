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
}

object ConfigRouterSpec {
  case class TP(source_type: String, sink_table: String, sink_columns: String)
}
