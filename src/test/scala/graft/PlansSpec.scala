package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.plans.GraftFunctions
import graft.tables.Tables

class PlansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("tokenize Generator matches TextFunctions.tokens on every document") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    docs.createOrReplaceTempView("plans_docs")
    val viaGen = spark.sql(
      "SELECT word, COUNT(*) AS ct FROM plans_docs LATERAL VIEW tokenize(text) t AS word GROUP BY word")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaExplode = docs.select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaGen === viaExplode)
  }

  test("tokenize Generator handles null and empty input") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(Some("Hello, World"), Some(""), None).toDF("t").createOrReplaceTempView("plans_null")
    val got = spark.sql("SELECT word FROM plans_null LATERAL VIEW tokenize(t) x AS word")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("hello", "world"))
  }
}
