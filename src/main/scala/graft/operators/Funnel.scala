package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis over an event stream — the conversion
  * question every behavior warehouse serves (the reference's gmall
  * domain: page view → cart add → order → payment; re-expressed over the
  * driver's generic events table). A user reaches stage i when an event
  * of stage i's type occurs STRICTLY after their stage i−1 time; each
  * stage time is the EARLIEST such event (the standard first-touch
  * funnel). Strictly-after is pinned: a same-microsecond pair does not
  * advance the funnel, in both engines identically.
  *
  * Scale: one filtered partial-agged aggregation plus one equi-join per
  * stage, all keyed by the user column — funnel depth is a small
  * constant, and no stage ever materializes per-user event arrays (the
  * collect-and-fold formulation ships every event to one row; this one
  * ships one timestamp per user per stage). Stage times are emitted as
  * epoch MICROSECONDS (exact integers — the cross-engine timestamp
  * rule).
  */
object Funnel {

  /** Per-user funnel: (user, t0_us..tk_us nullable, stage) where stage =
    * number of stages reached (0 rows never appear: users absent from
    * stage 0 are not in the funnel). */
  def stages(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stageTypes: Seq[String]): DataFrame = {
    require(stageTypes.nonEmpty, "funnel needs at least one stage")
    require(stageTypes.distinct.size == stageTypes.size,
      s"stage types must be distinct, got $stageTypes")
    // a NULL timestamp has no position in a time-ordered funnel: kept, a
    // user whose stage-0 events are all NULL-ts would emit the stage=0
    // row the contract above forbids (min over NULLs is NULL, but the
    // group row survives)
    val timed = events.filter(col(tsCol).isNotNull)
    val first = timed.filter(col(typeCol) === stageTypes.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    val acc = stageTypes.tail.zipWithIndex.foldLeft(first) {
      case (soFar, (st, i)) =>
        val nxt = timed.filter(col(typeCol) === st)
          .join(soFar.select(col(userCol), col(s"t$i")), Seq(userCol))
          .filter(col(tsCol) > col(s"t$i"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t${i + 1}"))
        soFar.join(nxt, Seq(userCol), "left")
    }
    // ascending fold nests the HIGHEST stage outermost: when(t_k, k+1)
    // .otherwise(when(t_{k-1}, k) ...) — deepest reached stage wins
    val stage = stageTypes.indices
      .foldLeft(lit(0)) { (acc2, i) =>
        when(col(s"t$i").isNotNull, lit(i + 1)).otherwise(acc2)
      }
    acc.select(
      (col(userCol) +:
        stageTypes.indices.map(i => unix_micros(col(s"t$i")).as(s"t${i}_us")) :+
        stage.as("stage")): _*)
  }
}
