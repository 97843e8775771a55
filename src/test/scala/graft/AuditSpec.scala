package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Audit

/** Audit semantics on hand-built tables: NULL FKs counted apart from
  * dangling ones, clean data says ok, and the profile's min/max respect
  * the ORIGINAL type's order, not string order.
  */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("referentialIntegrity: orphans, NULL keys, and the clean case") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(8L), None)
      .toDF("fk")
    val r = Audit.referentialIntegrity(child, col("fk"), parent, col("pk"))
      .collect().head
    // 6 child rows, 1 null key, distinct non-null keys {1,9,8} = 3,
    // orphan rows {9,9,8} = 3 over orphan keys {9,8} = 2, not ok
    assert(r.toSeq === Seq(6L, 1L, 3L, 3L, 2L, false))
    val clean = Audit.referentialIntegrity(
      Seq(1L, 2L).toDF("fk"), col("fk"), parent, col("pk")).collect().head
    assert(clean.toSeq === Seq(2L, 0L, 2L, 0L, 0L, true))
  }

  test("freshness: exact micro lag vs the pinned instant; coverageGaps finds only true holes") {
    import spark.implicits._
    val e = Seq(("a", "2024-01-01 10:00:00"), ("a", "2024-01-04 23:59:59"),
      ("b", "2024-01-02 00:00:00"))
      .toDF("k", "t").select(col("k"), to_timestamp(col("t")).as("ts"))
    val fr = Audit.freshness(e, col("k"), col("ts"),
        java.time.Instant.parse("2024-01-05T00:00:00Z"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fr("a")._2 === 1000000L) // one second of lag, in micros
    assert(fr("b")._2 === 3L * 24 * 3600 * 1000000L)
    // a observed on days 1 and 4 -> gaps are 2 and 3; b spans one day -> none
    val gaps = Audit.coverageGaps(e, col("k"), col("ts"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.take(10))).toSet
    assert(gaps === Set(("a", "2024-01-02"), ("a", "2024-01-03")))
  }

  test("NULL-keyed feeds: coverageGaps reports only true holes, alarm keeps the feed") {
    import spark.implicits._
    // null-keyed feed observed on days 1,2,4 -> the ONLY gap is day 3
    val e = Seq((None, "2024-01-01"), (None, "2024-01-02"), (None, "2024-01-04"),
      (Some("b"), "2024-01-01"), (Some("b"), "2024-01-02"))
      .toDF("k", "d")
      .select(col("k"), to_timestamp(concat(col("d"), lit(" 12:00:00"))).as("ts"))
    val gaps = Audit.coverageGaps(e, col("k"), col("ts"))
      .collect().map(r => (Option(r.getString(0)), r.getTimestamp(1).toString.take(10)))
    assert(gaps.toSeq === Seq((None, "2024-01-03")))
    // and the anomaly alarm must not silently drop the null-keyed feed
    val flagged = graft.operators.Anomaly.countAnomalies(
        e, col("k"), col("ts"), "day", k = 2)
      .collect().map(r => Option(r.getString(0))).toSet
    assert(flagged === Set(None, Some("b")))
  }

  test("columnProfile: typed min/max (9 < 10 numerically), exact distincts, nulls") {
    import spark.implicits._
    val df = Seq((9L, Some("b")), (10L, Some("a")), (10L, None))
      .toDF("num", "s")
    val got = Audit.columnProfile(df, Seq("num", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // string order would say max='9'; the typed compare must say 10
    assert(got("num") === ((3L, 0L, 2L, "9", "10")))
    assert(got("s") === ((3L, 1L, 2L, "a", "b")))
  }
}
