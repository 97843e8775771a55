package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // deterministic pseudo-random longs spanning negative and positive
  // values (exercises the arithmetic-shift floor division)
  private def h(i: Int, salt: Int): Long =
    (i * 2654435761L + salt * 40503L) % 1000L - 500L

  test("pointInInterval == brute-force theta join, negatives included") {
    import spark.implicits._
    val pts = (0 until 200).map(i => (i.toLong, h(i, 1))).toDF("pid", "v")
    val ivs = (0 until 100).map { i =>
      val lo = h(i, 2); (1000L + i, lo, lo + (i % 40))
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", bucketBits = 4)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val want = pts.crossJoin(ivs)
      .filter($"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got === want && want.nonEmpty, s"${got.size} vs ${want.size}")
  }

  test("intervalOverlap == brute force, canonical bucket emits each pair once") {
    import spark.implicits._
    val a = (0 until 80).map { i =>
      val lo = h(i, 3); (i.toLong, lo, lo + (i % 50))
    }.toDF("aid", "a_lo", "a_hi")
    val b = (0 until 80).map { i =>
      val lo = h(i, 4); (1000L + i, lo, lo + (i % 30))
    }.toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin
      .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", bucketBits = 3)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = a.crossJoin(b)
      .filter($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted === want.sorted && want.nonEmpty)
    assert(got.distinct.size === got.size, "canonical-bucket dedup failed")
  }

  test("equi-keys narrow the match set; key columns carried once") {
    import spark.implicits._
    val pts = (0 until 100).map(i => (i.toLong, s"k${i % 3}", h(i, 5)))
      .toDF("pid", "k", "v")
    val ivs = (0 until 60).map { i =>
      val lo = h(i, 6); (1000L + i, s"k${i % 3}", lo, lo + 100L)
    }.toDF("iid", "k", "lo", "hi")
    val joined = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi",
      bucketBits = 5, keys = Seq("k"))
    assert(joined.columns.count(_ == "k") === 1)
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = pts.as("p").join(ivs.as("i"),
        $"p.k" === $"i.k" && $"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got === want && want.nonEmpty)
  }

  test("plan is an equi-join on the bucket — no nested loop, no cartesian") {
    import spark.implicits._
    val pts = (0 until 50).map(i => (i.toLong, h(i, 1))).toDF("pid", "v")
    val ivs = (0 until 50).map { i =>
      val lo = h(i, 2); (1000L + i, lo, lo + 20L)
    }.toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", bucketBits = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("a giant interval fails loudly instead of exploding the stage") {
    import spark.implicits._
    val pts = Seq((1L, 0L)).toDF("pid", "v")
    val ivs = Seq((1L, 0L, 1L << 40)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi",
        bucketBits = 4, maxBucketsPerInterval = 128).count()
    }
    assert(e.getMessage.contains("RangeJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("RangeJoin")), e.getMessage)
  }
}
