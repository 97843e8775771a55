package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the STRUCTURAL plan properties the 100 TB story rests on, so a
  * refactor that quietly adds a corpus shuffle or rescans the corpus
  * fails here instead of in a bench regression three rounds later.
  * Counts come from the pre-AQE physical plan (`sparkPlan`) — the
  * planner's static decisions, deterministic at any SF.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  private def plan(name: String) =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan

  private def shuffles(name: String) =
    plan(name).collect { case e: ShuffleExchangeExec => e }.size

  test("q5_nation_revenue: the fact never shuffles before the final agg") {
    val p = plan("q5_nation_revenue")
    // <= 1: at sf0.001 the single-partition scan satisfies the agg's
    // distribution and even the final-agg exchange disappears
    assert(p.collect { case e: ShuffleExchangeExec => e }.size <= 1,
      s"expected at most the final-agg exchange:\n$p")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.size >= 3,
      s"dimension joins must stay broadcast:\n$p")
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty, s"no dimension join may shuffle the fact:\n$p")
  }

  test("j1_wide_join and t_token_stats: zero shuffles above the scans") {
    assert(shuffles("j1_wide_join") === 0)
    assert(shuffles("t_token_stats") === 0)
  }

  test("classification eval reads the cached confusion matrix, not the corpus, per marginal") {
    val p = plan("t_eval_langid")
    val fileScans = p.collect { case s: FileSourceScanExec => s }
    val cacheScans = p.collect { case c: InMemoryTableScanExec => c }
    assert(fileScans.isEmpty,
      s"a marginal branch rescans the corpus:\n$p")
    assert(cacheScans.size >= 3, // pred marginal, gold marginal, diagonal
      s"expected every metric branch on the cached confusion matrix:\n$p")
  }

  test("a13_count_anomaly: one corpus-sized agg; stats join back as broadcast") {
    val p = plan("a13_count_anomaly")
    // counts agg (1 exchange) + bucket-count-sized stats agg (1) — the
    // join back must NOT be a shuffle join over the counts
    assert(p.collect { case e: ShuffleExchangeExec => e }.size <= 2, s"$p")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.size === 1, s"$p")
  }
}
