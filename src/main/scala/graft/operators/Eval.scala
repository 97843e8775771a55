package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: per-query recall@k, MRR@k, and graded
  * nDCG@k of a ranked result list against relevance judgments (qrels).
  * The scorecard an embedding/ANN pipeline needs before swapping a
  * cheaper index in: run the candidate system (IVF, PQ, truncated dims,
  * quantized vectors, …) and the exact baseline over the same queries,
  * grade the baseline's top-k as gold, and read the damage off this
  * frame.
  *
  * Engine-parity arithmetic: every metric is an exact BIGINT in parts
  * per million — `recall_ppm = (10^6·hits) div n_rel`,
  * `mrr_ppm = 10^6 div first_rel_rank`, and nDCG through integer
  * gain·weight sums where gain = 2^rel − 1 and the rank discounts are a
  * PRECOMPUTED literal table `w_ppm(i) = floor(10^6 / log2(i+1))`
  * (computed once here, interpolated verbatim into the DuckDB oracle),
  * so no engine's `log` implementation ever enters the compare.
  *
  * Scale: one (qid, vec_id)-keyed equi-join of two k-bounded-per-query
  * frames, then qid-keyed partial aggs — no window over the corpus, no
  * driver loop; qrels' ideal ranking is a per-qid top-k
  * (WindowGroupLimit pre-prunes map-side). Safe at any query count.
  */
object Eval {

  /** floor(10^6 / log2(i+1)) for ranks i = 1..k — the shared discount
    * table (literal on both engines; see class doc). */
  def discountTablePpm(k: Int): Seq[Long] =
    (1 to k).map(i => math.floor(1000000.0 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** Per-query metrics of `results` (qid, vec_id, rank — rank 1-based,
    * deduplicated per qid) against `qrels` (qid, vec_id, rel — integer
    * grade, rel > 0 means relevant; grades above 30 fail LOUDLY via
    * raise_error — the gain·discount sums would leave BIGINT, and a
    * silent 2^rel wrap at 64 would zero a doc's gain while it still
    * counted in n_rel; real judgment scales stop at single digits
    * anyway). One output row per qid that has at least one relevant
    * judgment — a system returning nothing for a judged query scores 0,
    * it does not vanish from the frame:
    * (qid, n_rel, hits, recall_ppm, mrr_ppm, ndcg_ppm). */
  def retrievalMetrics(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wTable = discountTablePpm(k)
    def w(rankCol: Column): Column =
      element_at(array(wTable.map(lit): _*), rankCol.cast("int"))
    // 2^rel − 1 (the DSL's shiftleft only takes a literal shift width);
    // grades > 30 raise: Java masks the shift width to 6 bits, so rel=64
    // would silently yield gain 0 — a loud failure beats a wrong scorecard
    def gain(relCol: Column): Column =
      when(relCol > 30, raise_error(concat(
        lit("retrievalMetrics: rel grade > 30 overflows the BIGINT gain sums, got "),
        relCol.cast("string"))))
        .otherwise(call_function("shiftleft", lit(1L), relCol.cast("int")) - lit(1L))

    val r = results.select(col("qid"), col("vec_id"),
      col("rank").cast("long").as("rank")).filter(col("rank") <= k)
    // conflicting duplicate judgments take the MAX grade (the standard
    // qrels merge rule) — summing them would double-count n_rel/IDCG
    val q = qrels.select(col("qid"), col("vec_id"),
      col("rel").cast("long").as("rel")).filter(col("rel") > 0)
      .groupBy(col("qid"), col("vec_id")).agg(max(col("rel")).as("rel"))

    // retrieved ∩ relevant: hits, first relevant rank, realized DCG
    val got = r.join(q, Seq("qid", "vec_id"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("hits"),
        min(col("rank")).as("first_rel_rank"),
        sum(gain(col("rel")) * w(col("rank"))).as("dcg"))

    // ideal DCG: the qrels' own best ordering (rel desc, vec_id tiebreak)
    // cut at k — WindowGroupLimit prunes map-side before the qid shuffle
    val ideal = q
      .withColumn("irk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("vec_id"))))
      .filter(col("irk") <= k)
      .groupBy(col("qid"))
      .agg(sum(gain(col("rel")) * w(col("irk"))).as("idcg"))

    val nRel = q.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))

    nRel.join(ideal, Seq("qid"))
      .join(got, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr("(1000000 * coalesce(hits, 0L)) div n_rel").as("recall_ppm"),
        coalesce(expr("1000000 div first_rel_rank"), lit(0L)).as("mrr_ppm"),
        expr("(1000000 * coalesce(dcg, 0L)) div idcg").as("ndcg_ppm"))
  }

  /** Macro-average of a [[retrievalMetrics]] frame — the one-row summary
    * an eval report quotes (each QUERY weighs equally; micro-averaging
    * would let one heavily-judged query dominate). Exact integer ppm:
    * the mean is `sum(x_ppm) div n` — floor of the true mean, same on
    * both engines. */
  def retrievalSummary(metrics: DataFrame): DataFrame =
    metrics.agg(
      count(lit(1)).as("n_queries"),
      coalesce(expr("sum(recall_ppm) div count(1)"), lit(0L)).as("mean_recall_ppm"),
      coalesce(expr("sum(mrr_ppm) div count(1)"), lit(0L)).as("mean_mrr_ppm"),
      coalesce(expr("sum(ndcg_ppm) div count(1)"), lit(0L)).as("mean_ndcg_ppm"))

  /** Per-class precision/recall/F1 of predicted vs gold labels — the
    * audit frame for every labeler in the pipeline (language-ID, quality
    * classifier, any router): one row per label seen on EITHER side, so
    * a class the model never predicts (recall hole) and a label the
    * model hallucinates (precision hole) both surface instead of
    * vanishing from the report. Exact integer ppm; f1_ppm is the
    * harmonic mean OF THE ROUNDED ppm values (deterministic across
    * engines — a real-valued F1 would put both engines' float division
    * in the compare). Zero denominators score 0, loudly present.
    *
    * Scale: the corpus is scanned ONCE into the label²-bounded
    * confusion matrix (map-side combined count agg, persisted via the
    * shared cache registry); marginals, diagonal, and every metric
    * derive from that tiny frame — re-deriving them from the corpus
    * would triple the scan count, the thing a 100 TB eval can't afford. */
  def classificationMetrics(labeled: DataFrame, pred: Column, gold: Column): DataFrame =
    metricsFromConfusion(confusion(labeled, pred, gold), Nil)

  /** SLICED per-class metrics: the same scorecard computed per value of
    * `slice` (source, language, time bucket, …) — aggregate metrics hide
    * per-slice regressions (a labeler can gain overall while collapsing
    * on one source; slice-level eval is how that's caught). Output adds
    * a leading `slice` column; labels are scored within their slice
    * only. Same one-scan confusion-matrix plan, keyed by (slice, a, b). */
  def classificationMetricsBy(labeled: DataFrame, pred: Column, gold: Column,
      slice: Column): DataFrame =
    metricsFromConfusion(
      confusion(labeled, pred, gold, keys = Seq("slice" -> slice)), Seq("slice"))

  /** The raw (pred, gold, n) confusion matrix — the drill-down behind
    * [[classificationMetrics]]; one corpus scan, label² rows. A NULL
    * label on either side is a class of its own (see [[confusion]]) and
    * reads back as NULL here. */
  def confusionMatrix(labeled: DataFrame, pred: Column, gold: Column): DataFrame =
    confusion(labeled, pred, gold)
      .select(denull(col("a")).as("pred"), denull(col("b")).as("gold"),
        col("c").as("n"))

  private def metricsFromConfusion(cm: DataFrame, keys: Seq[String]): DataFrame = {
    val predKeys = keys :+ "label"
    val predC = cm.groupBy((keys.map(col) :+ col("a").as("label")): _*)
      .agg(sum(col("c")).as("n_pred"))
    val goldC = cm.groupBy((keys.map(col) :+ col("b").as("label")): _*)
      .agg(sum(col("c")).as("n_gold"))
    val tpC = cm.filter(col("a") === col("b"))
      .select((keys.map(col) :+ col("a").as("label") :+ col("c").as("tp")): _*)
    val joined = predC.join(goldC, predKeys, "full")
      .join(tpC, predKeys, "left")
      .select((predKeys.map(col) :+
        coalesce(col("n_gold"), lit(0L)).as("n_gold") :+
        coalesce(col("n_pred"), lit(0L)).as("n_pred") :+
        coalesce(col("tp"), lit(0L)).as("tp")): _*)
      .withColumn("precision_ppm",
        when(col("n_pred") > 0, expr("(1000000 * tp) div n_pred")).otherwise(0L))
      .withColumn("recall_ppm",
        when(col("n_gold") > 0, expr("(1000000 * tp) div n_gold")).otherwise(0L))
      .withColumn("f1_ppm",
        when(col("precision_ppm") + col("recall_ppm") > 0,
          expr("(2 * precision_ppm * recall_ppm) div (precision_ppm + recall_ppm)"))
          .otherwise(0L))
    // restore NULL labels/keys for the reader (sentineled for the joins)
    predKeys.foldLeft(joined)((df, k) => df.withColumn(k, denull(col(k))))
  }

  /** Inter-labeler agreement (Cohen's kappa): observed agreement
    * corrected for the agreement two independent labelers with these
    * marginals would reach by chance — the number that tells a labeling
    * pipeline whether two annotators (or a model and a human, or two
    * model versions) actually agree or just share a majority class.
    * One row: (n, agree, po_ppm, pe_ppm, kappa_ppm).
    *
    * Engine parity: po/pe in exact ppm; pe's Σ n_a·n_b / n² runs in
    * DECIMAL(38,0) (n² overflows BIGINT beyond ~3·10^9 rows) with the
    * exact floor-div `(x − x mod d) / d` — subtracting the remainder
    * first makes the decimal quotient an exact integer, so no engine's
    * rounding mode enters. kappa's numerator can be negative:
    * truncation toward zero is forced on both engines by dividing
    * |po−pe| and reapplying the sign (DuckDB's `//` floors negatives,
    * Spark's `div` truncates — the sign split removes the divergence).
    * Degenerate pe = 10^6 (both sides constant) reports kappa 0.
    *
    * Scale: one (a,b)-keyed count agg over the corpus (map-side
    * combined, label²-bounded, persisted — each marginal reads the
    * cached matrix, not the corpus), then driver-sized joins. */
  def agreement(labeled: DataFrame, a: Column, b: Column): DataFrame = {
    val counts = confusion(labeled, a, b)
    val tot = counts.agg(sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("agree"))
    val sp = counts.groupBy(col("a")).agg(sum(col("c")).as("na"))
      .join(counts.groupBy(col("b")).agg(sum(col("c")).as("nb")),
        col("a") === col("b"))
      .agg(coalesce(sum(col("na").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("sp"))
    tot.crossJoin(sp)
      .withColumn("po_ppm", expr("(1000000 * agree) div n"))
      .withColumn("pe_ppm",
        expr("""CAST((1000000 * sp - (1000000 * sp) % (CAST(n AS DECIMAL(38,0)) * n))
                     / (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"""))
      .withColumn("kappa_ppm",
        when(col("pe_ppm") === 1000000L, lit(0L)).otherwise(
          signum(col("po_ppm") - col("pe_ppm")).cast("long") *
            expr("(1000000 * abs(po_ppm - pe_ppm)) div (1000000 - pe_ppm)")))
      .select(col("n"), col("agree"), col("po_ppm"), col("pe_ppm"), col("kappa_ppm"))
  }

  /** Calibration scorecard of a [0, 10^6]-ppm scorer against binary
    * outcomes: `buckets` equal-width score bins, per bin the count, the
    * mean score, the observed positive rate, and their absolute gap —
    * the reliability-diagram frame behind "is this quality/language
    * classifier's score usable as a probability" (a score can rank
    * perfectly yet be useless as a keep-probability if uncalibrated; a
    * temperature-mix or importance-sampling stage that consumes scores
    * AS probabilities needs this check first).
    *
    * Engine-parity arithmetic: everything integer-exact — bin =
    * clamp((score·buckets) div 10^6), mean_score_ppm = Σscore div n,
    * pos_rate_ppm = (10^6·n_pos) div n. The negative-sum convention is
    * TRUNCATION toward zero on BOTH engines and this is empirically
    * pinned (EvalSpec): DuckDB's `//` truncates exactly like Spark's
    * `div` (`SELECT -5 // 2` = -2 on the gate's duckdb 1.0.0 — the
    * round-9 advice asserting `//` floors was tested and found FALSE;
    * a floor-division "fix" here would itself break parity). Scores
    * outside [0, 10^6] clamp into the edge bins (they still average
    * as-is — a clamped mean would hide the miscalibration they
    * represent); NULL score or outcome rows are excluded (no position
    * on the diagram).
    *
    * Scale: one scan, one `buckets`-bounded partial-agged groupBy. */
  def calibration(scored: DataFrame, scorePpm: Column, positive: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    scored
      .select(scorePpm.cast("long").as("s"), positive.cast("boolean").as("p"))
      .filter(col("s").isNotNull && col("p").isNotNull)
      // bucket from a PRE-clamped copy of the score: multiplying a wild
      // out-of-range score first could overflow Long and wrap a huge
      // positive into bin 0 instead of the documented top edge bin (the
      // mean still aggregates the UNCLAMPED value — see scaladoc)
      .withColumn("bucket", expr(
        s"(least(1000000L, greatest(0L, s)) * $buckets) div 1000000"))
      .withColumn("bucket",
        least(lit(buckets - 1L), col("bucket")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("__ssum"),
        sum(when(col("p"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bucket"), col("n"), col("n_pos"),
        // div truncates toward zero — SAME as DuckDB's `//` (verified
        // empirically, see scaladoc); do NOT "fix" this to floor
        expr("__ssum div n").as("mean_score_ppm"),
        expr("(1000000 * n_pos) div n").as("pos_rate_ppm"))
      .withColumn("gap_ppm", abs(col("mean_score_ppm") - col("pos_rate_ppm")))
  }

  /** One-row expected calibration error over [[calibration]]'s bins:
    * ECE_ppm = (Σ n_b·gap_b) div N — the n-weighted mean gap, exact
    * BIGINT (n_b·gap_b ≤ N·10^6, far inside 64 bits). Empty input → one
    * (0, 0) row, not an empty frame (a gate can always read it). */
  def calibrationError(scored: DataFrame, scorePpm: Column, positive: Column,
      buckets: Int = 10): DataFrame =
    calibration(scored, scorePpm, positive, buckets)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("n") * col("gap_ppm")), lit(0L)).as("__wg"))
      .select(col("n"),
        when(col("n") > 0, expr("__wg div n")).otherwise(0L).as("ece_ppm"))

  /** The (keys…, a, b, count) confusion matrix — ONE corpus scan,
    * label² rows, persisted on the session cache registry (released by
    * [[Dedup.releaseCaches]]/releaseSince like every operator-held
    * frame) so the metric derivations above never rescan the corpus.
    *
    * NULL labels are a CLASS OF THEIR OWN (an abstaining labeler is a
    * real behavior the scorecard must show, and two labelers both
    * abstaining is agreement): internally they carry a non-colliding
    * sentinel so the equi-joins and the a=b diagonal treat them as any
    * other label — plain joins drop null==null matches, which would
    * split the NULL class into two half-rows and zero its tp. Readers
    * see NULL again via [[denull]]. */
  private def confusion(labeled: DataFrame, a: Column, b: Column,
      keys: Seq[(String, Column)] = Nil): DataFrame = {
    val cols = keys.map { case (n, c) => sentinel(c).as(n) } ++
      Seq(sentinel(a).as("a"), sentinel(b).as("b"))
    Dedup.track(labeled.select(cols: _*)
      .groupBy((keys.map(k => col(k._1)) :+ col("a")) :+ col("b"): _*)
      .agg(count(lit(1)).as("c")).persist())
  }

  /** Sentinel no real `cast(x AS STRING)` can produce (NUL byte prefix). */
  private val NullLabel = "\u0000<null>"
  private def sentinel(c: Column): Column =
    coalesce(c.cast("string"), lit(NullLabel))
  private def denull(c: Column): Column =
    when(c === NullLabel, lit(null).cast("string")).otherwise(c)
}
