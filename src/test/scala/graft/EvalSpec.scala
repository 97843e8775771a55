package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Eval

/** Retrieval-metrics semantics on hand-built rankings: exact ppm values
  * from first principles, the judged-but-unretrieved query keeps a zero
  * row, unjudged results are ignored, and a perfect system scores 10^6
  * on every metric.
  */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def metrics(results: Seq[(Long, Long, Long)],
      qrels: Seq[(Long, Long, Long)], k: Int) = {
    import spark.implicits._
    Eval.retrievalMetrics(
      results.toDF("qid", "vec_id", "rank"),
      qrels.toDF("qid", "vec_id", "rel"), k)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
  }

  test("known ranking scores the hand-computed ppm values") {
    // qrels q1: a=rel3, b=rel1, c=rel2; system returns [b, x(unjudged), c]
    val m = metrics(
      results = Seq((1L, 20L, 1L), (1L, 99L, 2L), (1L, 30L, 3L)),
      qrels = Seq((1L, 10L, 3L), (1L, 20L, 1L), (1L, 30L, 2L)),
      k = 3)
    val w = Eval.discountTablePpm(3) // 1000000, 630929, 500000
    assert(w === Seq(1000000L, 630929L, 500000L))
    val dcg = 1L * w(0) + 3L * w(2) // b(gain 1)@1 + c(gain 3)@3
    val idcg = 7L * w(0) + 3L * w(1) + 1L * w(2) // ideal: a, c, b
    val (nRel, hits, recall, mrr, ndcg) = m(1L)
    assert((nRel, hits) === (3L, 2L))
    assert(recall === 1000000L * 2 / 3) // 666666
    assert(mrr === 1000000L) // first relevant at rank 1
    assert(ndcg === 1000000L * dcg / idcg)
  }

  test("judged query with no retrieved relevant scores zeros, not absence") {
    val m = metrics(
      results = Seq((1L, 99L, 1L)), // only an unjudged doc
      qrels = Seq((1L, 10L, 2L), (2L, 10L, 1L)), // q2 has NO results at all
      k = 5)
    assert(m(1L) === ((1L, 0L, 0L, 0L, 0L)))
    assert(m(2L) === ((1L, 0L, 0L, 0L, 0L)))
  }

  test("perfect system scores 10^6 everywhere; ranks beyond k are ignored") {
    val m = metrics(
      // gold order exactly, plus a relevant doc at rank 4 > k
      results = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), (1L, 40L, 4L)),
      qrels = Seq((1L, 10L, 3L), (1L, 20L, 2L), (1L, 30L, 1L), (1L, 40L, 1L)),
      k = 3)
    val (nRel, hits, recall, mrr, ndcg) = m(1L)
    assert((nRel, hits) === (4L, 3L))
    assert(recall === 750000L)
    assert(mrr === 1000000L)
    assert(ndcg === 1000000L) // realized order == ideal order at k=3
  }

  test("classificationMetrics: hand-computed per-class ppm; one-sided labels score 0") {
    import spark.implicits._
    // gold:  a a a b b c    pred:  a a b b b d
    val df = Seq(("a", "a"), ("a", "a"), ("b", "a"), ("b", "b"), ("b", "b"), ("d", "c"))
      .toDF("p", "g")
    val m = Eval.classificationMetrics(df, col("p"), col("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(m.keySet === Set("a", "b", "c", "d"))
    // a: gold 3, pred 2, tp 2 -> P 1.0, R 2/3, F1 = 2PR/(P+R) of the ppms
    assert(m("a") === ((3L, 2L, 2L, 1000000L, 666666L,
      2L * 1000000L * 666666L / (1000000L + 666666L))))
    // b: gold 2, pred 3, tp 2 -> P 2/3, R 1.0
    assert(m("b") === ((2L, 3L, 2L, 666666L, 1000000L,
      2L * 666666L * 1000000L / (666666L + 1000000L))))
    // c: gold-only (model never predicts it); d: pred-only (hallucinated)
    assert(m("c") === ((1L, 0L, 0L, 0L, 0L, 0L)))
    assert(m("d") === ((0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("agreement: hand-computed kappa; independent and degenerate labelers") {
    import spark.implicits._
    // 10 rows: agree on 6; marginals a: x6 y4, b: x6 y4
    val rows = Seq.fill(4)(("x", "x")) ++ Seq.fill(2)(("y", "y")) ++
      Seq.fill(2)(("x", "y")) ++ Seq.fill(2)(("y", "x"))
    val got = Eval.agreement(rows.toDF("a", "b"), col("a"), col("b")).collect().head
    val (n, agree, po, pe) = (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
    assert((n, agree, po) === ((10L, 6L, 600000L)))
    assert(pe === (1000000L * (6 * 6 + 4 * 4)) / 100) // 520000
    assert(got.getLong(4) === (600000L - 520000L) * 1000000L / (1000000L - 520000L))
    // worse-than-chance: perfect DISagreement on balanced labels -> kappa -10^6
    val anti = Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x"))
    val g2 = Eval.agreement(anti.toDF("a", "b"), col("a"), col("b")).collect().head
    assert((g2.getLong(2), g2.getLong(3), g2.getLong(4)) === ((0L, 500000L, -1000000L)))
    // degenerate: both constant -> pe = 10^6, kappa pinned to 0
    val const = Seq.fill(3)(("x", "x"))
    val g3 = Eval.agreement(const.toDF("a", "b"), col("a"), col("b")).collect().head
    assert((g3.getLong(2), g3.getLong(3), g3.getLong(4)) === ((1000000L, 1000000L, 0L)))
  }

  test("duplicate judgments merge by max grade, not double-count") {
    val m = metrics(
      results = Seq((1L, 10L, 1L)),
      // doc 10 judged twice (rel 1 and rel 3): must count ONCE at rel 3
      qrels = Seq((1L, 10L, 1L), (1L, 10L, 3L), (1L, 20L, 2L)),
      k = 2)
    val w = Eval.discountTablePpm(2)
    val (nRel, hits, recall, mrr, ndcg) = m(1L)
    assert((nRel, hits) === (2L, 1L))
    assert(recall === 500000L && mrr === 1000000L)
    assert(ndcg === 1000000L * (7L * w(0)) / (7L * w(0) + 3L * w(1)))
  }

  test("classificationMetricsBy: slices score independently; confusionMatrix drills down") {
    import spark.implicits._
    // slice s1 is perfect on {a}; slice s2 mislabels every a as b
    val df = Seq(("s1", "a", "a"), ("s1", "a", "a"), ("s2", "b", "a"), ("s2", "b", "b"))
      .toDF("src", "p", "g")
    val by = Eval.classificationMetricsBy(df, col("p"), col("g"), col("src"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(by(("s1", "a")) === ((2L, 2L, 2L, 1000000L, 1000000L, 1000000L)))
    assert(by(("s2", "a")) === ((1L, 0L, 0L, 0L, 0L, 0L))) // never predicted IN s2
    assert(by(("s2", "b")) === ((1L, 2L, 1L, 500000L, 1000000L,
      2L * 500000L * 1000000L / 1500000L)))
    // an aggregate run hides s2's collapse on 'a' — the reason slicing exists
    val agg = Eval.classificationMetrics(df, col("p"), col("g"))
      .filter(col("label") === "a").collect().head
    assert(agg.getLong(4) === 1000000L && agg.getLong(5) === 666666L)
    val cm = Eval.confusionMatrix(df, col("p"), col("g"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cm === Map(("a", "a") -> 2L, ("b", "a") -> 1L, ("b", "b") -> 1L))
  }

  test("retrievalSummary: exact floor-div macro-average, each query equal weight") {
    import spark.implicits._
    val m = Seq((1L, 2L, 1L, 1000000L, 1000000L, 900000L),
      (2L, 4L, 1L, 250000L, 500000L, 300001L))
      .toDF("qid", "n_rel", "hits", "recall_ppm", "mrr_ppm", "ndcg_ppm")
    val r = Eval.retrievalSummary(m).collect().head
    assert(r.toSeq === Seq(2L, 625000L, 750000L, 600000L)) // floor((9e5+300001)/2)
    val empty = Eval.retrievalSummary(m.filter(col("qid") < 0)).collect().head
    assert(empty.toSeq === Seq(0L, 0L, 0L, 0L))
  }

  test("NULL is a class of its own: one row, null==null agrees, kappa sees it") {
    import spark.implicits._
    // pred: null null a a ; gold: null b a null
    val df = Seq((None, Some("x")), (None, Some("b")), (Some("a"), Some("a")),
      (Some("a"), None)).toDF("p", "g")
      .select(when(col("p") === "x", lit(null)).otherwise(col("p")).as("p"),
        when(col("g") === "x", lit(null)).otherwise(col("g")).as("g"))
    val m = Eval.classificationMetrics(df, col("p"), col("g"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // NULL class: gold {row1, row4} = 2, pred {row1, row2} = 2, tp = {row1} = 1
    assert(m(None) === ((2L, 2L, 1L)))
    assert(m(Some("a")) === ((1L, 2L, 1L)))
    assert(m(Some("b")) === ((1L, 0L, 0L)))
    assert(m.size === 3) // ONE null row, not two half-rows
    val cm = Eval.confusionMatrix(df, col("p"), col("g"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2))
      .toMap
    assert(cm((None, None)) === 1L && cm((Some("a"), None)) === 1L)
    // agreement counts the null-null row as agreement (both abstained)
    val ag = Eval.agreement(df, col("p"), col("g")).collect().head
    assert(ag.getLong(1) === 2L) // (null,null) and (a,a)
  }

  test("calibration: hand-checked bins, clamped out-of-range scores, exact ECE") {
    import spark.implicits._
    // bin width 100_000 (10 bins). Rows: two in bin 0 (scores 0 and
    // 50_000, one positive), one in bin 9 via clamp (score 1_200_000,
    // positive), one NULL score (dropped), one NULL outcome (dropped).
    val df = Seq(
      (Some(0L), Some(false)),
      (Some(50000L), Some(true)),
      (Some(1200000L), Some(true)),
      (None: Option[Long], Some(true)),
      (Some(7L), None: Option[Boolean])).toDF("s", "p")
    val bins = Eval.calibration(df, col("s"), col("p"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // bin 0: n=2, n_pos=1, mean=(0+50000) div 2=25000, rate=500000, gap=475000
    assert(bins(0L) === ((2L, 1L, 25000L, 500000L, 475000L)))
    // bin 9 (clamped): n=1, n_pos=1, mean=1200000 (unclamped mean — the
    // out-of-range score IS the miscalibration), rate=10^6, gap=200000
    assert(bins(9L) === ((1L, 1L, 1200000L, 1000000L, 200000L)))
    assert(bins.size === 2)
    // ECE = (2*475000 + 1*200000) div 3 = 383333
    val ece = Eval.calibrationError(df, col("s"), col("p")).collect().head
    assert((ece.getLong(0), ece.getLong(1)) === ((3L, 383333L)))
    // empty input -> one (0, 0) row, not an empty frame
    val empty = Eval.calibrationError(
      Seq.empty[(Option[Long], Option[Boolean])].toDF("s", "p"), col("s"), col("p"))
      .collect().head
    assert((empty.getLong(0), empty.getLong(1)) === ((0L, 0L)))
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("calibration: negative score sums truncate toward zero, matching DuckDB's //") {
    import spark.implicits._
    // both rows land in bin 0 (clamp); sum = -5, n = 2. Truncation gives
    // -2 — EMPIRICALLY the DuckDB convention too (`SELECT -5 // 2` = -2
    // on the gate's duckdb 1.0.0; `//` truncates, it does NOT floor).
    // This pins the parity so a well-meaning floor-division "fix" (round
    // 9 briefly shipped one off a false advice premise) fails here.
    val df = Seq((-5L, false), (0L, false)).toDF("s", "p")
    val bin = Eval.calibration(df, col("s"), col("p")).collect().head
    assert(bin.getLong(0) === 0L && bin.getLong(1) === 2L)
    assert(bin.getLong(3) === -2L,
      s"mean_score_ppm = ${bin.getLong(3)}, want trunc(-5/2) = -2 (DuckDB // parity)")
    assert(bin.getLong(5) === 2L) // gap = |-2 - 0|
  }

  test("rel=0 judgments are non-relevant: excluded from n_rel, hits, and ideal") {
    val m = metrics(
      results = Seq((1L, 10L, 1L), (1L, 20L, 2L)),
      qrels = Seq((1L, 10L, 0L), (1L, 20L, 2L)),
      k = 2)
    val w = Eval.discountTablePpm(2)
    val (nRel, hits, recall, mrr, ndcg) = m(1L)
    assert((nRel, hits) === (1L, 1L))
    assert(recall === 1000000L)
    assert(mrr === 500000L) // first relevant at rank 2
    assert(ndcg === 1000000L * (3L * w(1)) / (3L * w(0)))
  }
}
