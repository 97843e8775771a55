package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.Tables

class ApproxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("approx UV is within HLL error bounds of exact UV per day") {
    val exact = Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(countDistinct(col("user_id")).as("uv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("a5_approx_uv")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((dt, a) <- approx) {
      val e = exact(dt)
      assert(math.abs(a - e).toDouble / e <= 0.1, s"$dt approx=$a exact=$e")
    }
  }
}
