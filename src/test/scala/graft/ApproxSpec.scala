package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.Tables

class ApproxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("approx UV is within HLL error bounds of exact UV per day") {
    // the raw sketch values, bounded directly (the catalog query folds this
    // comparison into its own `ok` column — checked below)
    val rows = Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    for ((dt, a, e) <- rows)
      assert(math.abs(a - e).toDouble / e <= 0.1, s"$dt approx=$a exact=$e")
    // the self-validating catalog query agrees: every row reports ok=true
    val gated = SparkEntry.queries("a5_approx_uv")(spark, dir).collect()
    assert(gated.length === rows.length && gated.forall(!_.isNullAt(2)))
    assert(gated.forall(_.getBoolean(2)), "a5_approx_uv reported ok=false")
  }
}
