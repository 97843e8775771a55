package graft.sinks

import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Sink adapters (SURVEY §7.1): the engine's pipelines end at this trait
  * so storage backends swap without touching operator code. Parquet
  * stands in for ClickHouse/Phoenix locally; `JdbcSink` is the production
  * ClickHouse path (same `foreachBatch` body in streaming — see
  * StreamingPipelines.parquetBatchSink).
  */
trait Sink {
  def write(df: DataFrame): Unit
}

/** K4-analog batch sink: append parquet, optionally partitioned (the
  * partition column is the K2 dynamic-routing seam). */
final case class ParquetSink(path: String, partitionBy: Seq[String] = Nil) extends Sink {
  def write(df: DataFrame): Unit = {
    val w = df.write.mode("append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}

/** ClickHouse/MySQL JDBC sink (untestable offline — no JDBC endpoint in
  * this environment; the write body is the standard df.write.jdbc with
  * batching, matching MyClickhouseUtil.java:57-102's batch semantics). */
final case class JdbcSink(url: String, table: String, batchSize: Int = 5000) extends Sink {
  def write(df: DataFrame): Unit = {
    val props = new Properties()
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode("append").jdbc(url, table, props)
  }
}

/** K7 print/debug sink. */
final case class ConsoleSink(numRows: Int = 20) extends Sink {
  def write(df: DataFrame): Unit = df.show(numRows, truncate = false)
}
