package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Sketches}

/** Count-min sketch semantics: exactness without collisions, soundness
  * under maximal collision pressure, and element-wise mergeability (the
  * property that makes the sketch the distributed/incremental counter).
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def obs(counts: (String, Int)*) = {
    import spark.implicits._
    counts.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
  }

  test("no-collision regime: estimates are exact; heavy cut keeps exactly the heavy keys") {
    val o = obs("a" -> 10, "b" -> 3, "c" -> 1, "d" -> 7)
    val got = Sketches.heavyHitters(o, col("k"), minCount = 5L, depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Dedup.releaseCaches(spark)
    // 4 keys in width 1024: astronomically unlikely to collide in all 4
    // rows; estimates are exact and only a, d reach the cut
    assert(got === Map("a" -> 10L, "d" -> 7L))
  }

  test("maximal collision pressure (width 1): est = total observations, still sound") {
    val o = obs("a" -> 10, "b" -> 3)
    val counters = Sketches.countMinCounters(o, col("k"), depth = 2, width = 1)
    val est = Sketches.countMinEstimate(o, col("k"), counters, depth = 2, width = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // everything lands in the one cell: every estimate is the stream size
    // (13) — inflated, never below truth
    assert(est === Map("a" -> 13L, "b" -> 13L))
  }

  test("counters merge by element-wise sum: sketch(full) == sketch(half1) + sketch(half2)") {
    val full = obs("a" -> 6, "b" -> 4, "c" -> 2)
    val h1 = obs("a" -> 4, "b" -> 1)
    val h2 = obs("a" -> 2, "b" -> 3, "c" -> 2)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMinCounters(df, col("k"), depth = 3, width = 64)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cells(h1).toSeq ++ cells(h2).toSeq)
      .groupBy(_._1).map { case (cell, vs) => cell -> vs.map(_._2).sum }
    assert(merged === cells(full))
  }

  test("NULL keys are excluded; empty input yields an empty sketch") {
    import spark.implicits._
    val o = Seq(Some("a"), None, Some("a")).toDF("k")
    val counters = Sketches.countMinCounters(o, col("k"), depth = 2, width = 8)
    // 2 observations × 2 rows = 4 increments across ≤ 4 cells
    assert(counters.agg(sum(col("c"))).collect()(0).getLong(0) === 4L)
    assert(Sketches.countMinCounters(
      Seq.empty[String].toDF("k"), col("k"), 2, 8).count() === 0)
  }
}
