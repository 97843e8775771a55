package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel

/** Hand-computed funnel semantics: strictly-after ordering, first-touch
  * stage times, absent stage-0 users. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")

  test("strictly-after stages; same-instant does not advance; stage-0 absentees") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"), // full
      (2L, ts(1), "click"), (2L, ts(2), "view"), // click BEFORE view: stage 1
      (3L, ts(1), "view"), (3L, ts(1), "click"), // same instant: no advance
      (4L, ts(1), "purchase"), // never viewed: not in the funnel
      (5L, ts(1), "view"), (5L, ts(2), "click"), (5L, ts(2), "purchase"), // p not after c
      (6L, ts(5), "view"), (6L, ts(2), "click"), (6L, ts(6), "click"), // late click counts
      (1L, ts(9), "click")) // later click must NOT move the first-touch t1
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.stages(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(4), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 5L, 6L))
    assert(got(1L)._1 === 3)
    assert(got(2L)._1 === 1)
    assert(got(3L)._1 === 1)
    assert(got(5L)._1 === 2)
    assert(got(6L)._1 === 2) // the 10:00:06 click, after the 10:00:05 view
    // first-touch: user 1's t1 is the 10:00:02 click, not the 10:00:09 one
    def us(s: Int) = ts(s).getTime * 1000L
    assert(got(1L)._3 === Some(us(2)))
    assert(got(6L)._3 === Some(us(6)))
  }
}
