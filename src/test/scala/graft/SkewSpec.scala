package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewOps
import graft.operators.SkewOps.Agg
import graft.tables.Tables

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_linenumber"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1), r.getLong(2))
    val plain = li.join(ord, "l_orderkey").collect().map(key).sorted
    val salted = SkewOps.saltedJoin(li, ord, "l_orderkey", buckets = 4)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
      .collect().map(key).sorted
    assert(salted.toSeq === plain.toSeq && plain.nonEmpty)
  }

  test("salted aggregate == direct groupBy for algebraic aggregates") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,2)").as("qty"))
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("qty")).as("sum_qty"), min(col("qty")).as("mn"), count(lit(1)).as("ct"))
      .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getDecimal(2), r.getLong(3))).toMap
    val salted = SkewOps.saltedAggregate(li, Seq("l_returnflag"),
      Seq(Agg.sumOf(col("qty"), "sum_qty"), Agg.minOf(col("qty"), "mn"), Agg.countAll("ct")))
      .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getDecimal(2), r.getLong(3))).toMap
    assert(salted === direct)
  }
}
