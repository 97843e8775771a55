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

  test("fused CosineSimilarity is bit-identical to the compositional form") {
    val emb = Tables.embeddings(spark, dir)
    val v = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("e"))
    val q = v.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val joined = v.crossJoin(q).filter(col("qid") =!= col("vec_id"))
    val fused = joined.select(
      graft.plans.VectorExpressions.cosineFused(col("qe"), col("e")).as("s"))
      .collect().map(_.getDouble(0))
    val comp = joined.select(
      graft.functions.VectorFunctions.cosine(col("qe"), col("e")).as("s"))
      .collect().map(_.getDouble(0))
    assert(fused.length === comp.length && fused.length > 0)
    fused.zip(comp).foreach { case (f, c) => assert(f === c) }
  }

  test("tokenize Generator runs inside WholeStageCodegen (no fallback)") {
    GraftFunctions.register(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("plans_docs_cg")
    val df = spark.sql(
      "SELECT word FROM plans_docs_cg LATERAL VIEW tokenize(text) t AS word")
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Generate""".r.findFirstIn(plan).isDefined,
      s"Generate not codegen'd:\n$plan")
    assert(df.count() > 0)
  }

  test("fused md5-prefix hash == compositional conv(substring(md5)) chain") {
    GraftFunctions.register(spark)
    val toks = Tables.documents(spark, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
    val pairs = toks.select(
      TextFunctions.hash32(col("t")).as("fused"),
      TextFunctions.hash32Compositional(col("t")).as("comp"))
    assert(pairs.filter(col("fused") =!= col("comp")).count() === 0)
    assert(pairs.count() > 0)
  }

  test("fused HyperplaneSketch == composed dim×nPlanes expression tree") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val fused = graft.operators.Similarity.hyperplaneBuckets(emb, 64, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val composed = graft.operators.Similarity.hyperplaneBucketsComposed(emb, 64, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fused.nonEmpty && fused === composed)
    // and the fused sketch is a SINGLE projected expression, not a tree of
    // dim×nPlanes md5 chains — the plan prints one hyperplanesketch call
    val plan = graft.operators.Similarity.hyperplaneBuckets(emb, 64, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("md5"), s"composed md5 chain leaked into plan:\n$plan")
  }

  test("hyperplane_sketch rejects non-double-array input at analysis time") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    emb.createOrReplaceTempView("plans_emb")
    // raw array<float> must be rejected — getDouble over 4-byte slots would
    // silently produce garbage buckets
    val e = intercept[Exception] {
      spark.sql("SELECT hyperplane_sketch(embedding, 64, 8) FROM plans_emb").collect()
    }
    assert(e.getMessage.contains("ARRAY<DOUBLE>"), e.getMessage)
  }

  test("md5_prefix32 rejects non-string input at analysis time") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(1L, 2L).toDF("n").createOrReplaceTempView("plans_longs")
    val e = intercept[Exception] {
      spark.sql("SELECT md5_prefix32(n) FROM plans_longs").collect()
    }
    assert(e.getMessage.contains("STRING"), e.getMessage)
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
