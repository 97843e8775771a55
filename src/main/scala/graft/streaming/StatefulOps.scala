package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the reference's keyed-state operators (SURVEY §2.5
  * A5–A8), built on flatMapGroupsWithState. Each has a batch oracle in
  * DwsQueries; the specs assert stream ≡ batch over the same input.
  *
  * State sizing at scale: state is one small record per key (user), hash
  * partitioned by the groupByKey shuffle — the same topology as the
  * reference's keyed ValueState (Dws02...java:81-153), with Spark's state
  * store (HDFS/RocksDB) replacing Flink state backends.
  */
object StatefulOps {

  case class UserEvent(user_id: Long, event_type: String, ts: Timestamp, event_id: Long)

  /** Seen dates per user, most-recent `maxDates` kept (ISO strings sort
    * chronologically). A single last-date scalar would re-emit a LATE day
    * older than the max on every micro-batch that carries it — the bounded
    * set keeps exactly-once per (user, day) under cross-batch disorder
    * while state stays O(active days), not O(events). */
  case class DailyState(dates: Seq[String])

  /** A5: exact daily-UV dedup — emit one row per (user, day) first visit.
    * State = bounded set of seen dates per user.
    *
    * `stateTtl` mirrors the reference's 1-day StateTtlConfig
    * (Dws02...java:97-101) via ProcessingTimeTimeout eviction. It is
    * opt-in: Some("1 day") in production; None (NoTimeout) by default
    * because MemoryStream + processAllAvailable hangs under
    * ProcessingTimeTimeout in Spark 4.1 (timeout batches never settle),
    * which would wedge bounded-replay tests. */
  def dailyFirstVisits(spark: SparkSession, events: DataFrame,
      stateTtl: Option[String] = None): Dataset[(Long, String)] = {
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (user: Long, rows: Iterator[UserEvent], state: GroupState[DailyState]) => {
          if (!rows.hasNext && state.hasTimedOut) {
            state.remove() // TTL eviction
            Iterator.empty
          } else {
            val maxDates = 64
            val seen = scala.collection.mutable.Set.empty[String]
            state.getOption.foreach(s => seen ++= s.dates)
            val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
              val dt = e.ts.toLocalDateTime.toLocalDate.toString
              if (seen.add(dt)) Some(user -> dt) else None
            }
            if (seen.nonEmpty)
              state.update(DailyState(seen.toSeq.sorted.takeRight(maxDates)))
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
  }

  case class VisitState(firstDate: String)

  /** A7: new-visitor repair — emit each event with a corrected is_new flag
    * (1 only on the user's true first date; BaseLogApp.java:76-106). */
  def isNewRepair(spark: SparkSession, events: DataFrame): Dataset[(Long, Long, Int)] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[UserEvent], state: GroupState[VisitState]) => {
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          // min over stored AND batch first: a LATE earlier-day event in a
          // later micro-batch is the true first visit and must be labeled
          // is_new=1 (and lower the state) — keeping the stored date would
          // diverge from the batch min(dt) oracle for every later event.
          // Rows already emitted under the old first stand (append mode
          // cannot retract); state converges to the batch semantics.
          val batchFirst = sorted.head.ts.toLocalDateTime.toLocalDate.toString
          val first = state.getOption.map(_.firstDate)
            .fold(batchFirst)(s => if (batchFirst < s) batchFirst else s)
          state.update(VisitState(first))
          sorted.iterator.map { e =>
            val dt = e.ts.toLocalDateTime.toLocalDate.toString
            (user, e.event_id, if (dt == first) 1 else 0)
          }
        })
  }

  case class LoginState(lastDate: String)

  /** A6: back-flow detection — emit (user, date, isBack) per active day;
    * isBack = gap since previous active day > 7 days (Dws04...java:82-125). */
  def backflowDays(spark: SparkSession, events: DataFrame): Dataset[(Long, String, Int)] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[UserEvent], state: GroupState[LoginState]) => {
          val days = rows.map(_.ts.toLocalDateTime.toLocalDate).toSeq.distinct.sorted
          var last = state.getOption.map(s => java.time.LocalDate.parse(s.lastDate))
          // days at or before the stored lastDate are SKIPPED, not
          // re-emitted: a cross-batch re-delivery of a seen day would
          // duplicate its row, and a late earlier day would REGRESS the
          // state and make the next real day a spurious 7-day "return".
          // Gap semantics are forward-only (the reference keyed state is
          // too); the stream≡batch contract holds on event-time-ordered
          // feeds and degrades to no-emit (never to wrong emits) under
          // cross-batch disorder.
          val out = days.flatMap { d =>
            if (last.exists(l => !d.isAfter(l))) None
            else {
              val isBack =
                last.exists(l => java.time.temporal.ChronoUnit.DAYS.between(l, d) > 7)
              last = Some(d)
              Some((user, d.toString, if (isBack) 1 else 0))
            }
          }
          last.foreach(l => state.update(LoginState(l.toString)))
          out.iterator
        })
  }

  case class SeenFp(seen: Boolean)

  /** Streaming exact document dedup by content fingerprint — the streaming
    * twin of Dedup.exactGroups: the FIRST document per fingerprint (min
    * doc_id within the first micro-batch that carries it) is emitted, every
    * later duplicate is dropped across micro-batches. State = one boolean
    * marker per DISTINCT fingerprint (bounded by corpus cardinality, not
    * stream length); at 100 TB this is the corpus-ingest dedup gate, hash
    * partitioned by the groupByKey shuffle like every other keyed state. */
  def dedupDocsByFingerprint(spark: SparkSession, docs: DataFrame): Dataset[(String, Long)] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: String, rows: Iterator[(Long, String)], state: GroupState[SeenFp]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(SeenFp(true))
            Iterator.single(fp -> rows.map(_._1).min)
          }
        })
  }

  /** A8: first-row dedup by key within the watermark window — the streaming
    * form of Dws09's 5s-TTL ValueState marker. */
  def dedupFirstWithinWatermark(events: DataFrame, delay: String = "5 seconds"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
}
