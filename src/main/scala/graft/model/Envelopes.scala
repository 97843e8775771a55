package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Changelog envelope schemas and builders (FIXTURES.md §2-§3).
  *
  * Maxwell (topic_db rows, MyKafkaUtil.java:139-148):
  *   {database, table, type, ts, data: MAP, old: MAP}
  * Debezium (config CDC, DIM_MyBroadcastFunction.java:26-59):
  *   {before, after, op: c|u|d|r, ts_ms}
  *
  * Payloads are stringly-typed maps, exactly like the reference; the
  * builders wrap any DataFrame's rows so CDC routing is testable without
  * Kafka/MySQL.
  */
object Envelopes {

  /** Full nested log-event schema (FIXTURES.md §1: common/page structs +
    * displays/actions arrays + start/err markers + epoch-ms ts) — the
    * input contract of the BaseLogApp-family pipelines. p10_log_pipeline
    * exercises the build→parse→explode machinery on this shape. */
  val logEventSchema: StructType = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("ar", StringType), StructField("ba", StringType),
      StructField("ch", StringType), StructField("is_new", StringType),
      StructField("md", StringType), StructField("mid", StringType),
      StructField("os", StringType), StructField("uid", StringType),
      StructField("vc", StringType)))),
    StructField("page", StructType(Seq(
      StructField("during_time", LongType), StructField("item", StringType),
      StructField("item_type", StringType), StructField("last_page_id", StringType),
      StructField("page_id", StringType)))),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("display_type", StringType), StructField("item", StringType),
      StructField("item_type", StringType), StructField("pos_id", IntegerType))))),
    StructField("actions", ArrayType(StructType(Seq(
      StructField("action_id", StringType), StructField("item", StringType),
      StructField("item_type", StringType), StructField("ts", LongType))))),
    StructField("start", StructType(Seq(
      StructField("entry", StringType), StructField("loading_time", LongType)))),
    StructField("err", StructType(Seq(
      StructField("error_code", IntegerType), StructField("msg", StringType)))),
    StructField("ts", LongType)))

  val maxwellSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", LongType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType))))

  def debeziumSchema(payload: DataType): StructType = StructType(Seq(
    StructField("before", payload),
    StructField("after", payload),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** All columns of `df` as a MAP<STRING,STRING> payload. */
  def payloadMap(df: DataFrame): Column =
    map(df.columns.flatMap(c => Seq(lit(c), col(c).cast("string"))).toIndexedSeq: _*)

  /** Wrap each row of `df` in a Maxwell-envelope JSON string.
    * `typeCol` supplies the changelog type per row. */
  def toMaxwellJson(df: DataFrame, table: String, typeCol: Column, tsCol: Column): Column =
    to_json(struct(
      lit("gmall").as("database"),
      lit(table).as("table"),
      typeCol.as("type"),
      tsCol.cast("long").as("ts"),
      payloadMap(df).as("data"),
      map().cast(MapType(StringType, StringType)).as("old")))

  /** Parse a Maxwell JSON string column into envelope columns. */
  def parseMaxwell(raw: Column): Column = from_json(raw, maxwellSchema)
}
