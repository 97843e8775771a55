package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ExactDistinct
import graft.tables.Tables

class AggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("single-pass exact-distinct Aggregator == countDistinct per event_type") {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val viaAgg = ev.select($"event_type", $"user_id").as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(ExactDistinct.distinctCount.name("uv"))
      .collect().map { case (k, v) => k -> v }.toMap
    val viaCd = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("uv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg === viaCd)
  }
}
