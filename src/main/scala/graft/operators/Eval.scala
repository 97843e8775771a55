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
    * grade, rel > 0 means relevant; rel must be < 62 so 2^rel fits a
    * BIGINT). One output row per qid that has at least one relevant
    * judgment — a system returning nothing for a judged query scores 0,
    * it does not vanish from the frame:
    * (qid, n_rel, hits, recall_ppm, mrr_ppm, ndcg_ppm). */
  def retrievalMetrics(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wTable = discountTablePpm(k)
    def w(rankCol: Column): Column =
      element_at(array(wTable.map(lit): _*), rankCol.cast("int"))
    // 2^rel − 1 (the DSL's shiftleft only takes a literal shift width)
    def gain(relCol: Column): Column =
      call_function("shiftleft", lit(1L), relCol.cast("int")) - lit(1L)

    val r = results.select(col("qid"), col("vec_id"),
      col("rank").cast("long").as("rank")).filter(col("rank") <= k)
    val q = qrels.select(col("qid"), col("vec_id"),
      col("rel").cast("long").as("rel")).filter(col("rel") > 0)

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
}
