package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Model-based data selection: a hashed-feature linear quality classifier
  * (the CCNet / fastText-style pre-filter every web-scale corpus pipeline
  * runs) and DSIR-flavored importance weighting for domain-targeted
  * selection (Xie et al., NeurIPS 2023 — hashed n-gram features scored
  * against a target vs raw distribution).
  *
  * Both train in ONE aggregation over the (tiny, fixed-B) hashed feature
  * space and score map-side through a broadcast weight table — the right
  * split at 100 TB: the model is B rows, the corpus is the scan.
  *
  * Engine-parity arithmetic: the canonical formulation scores with
  * log-odds, but IEEE 754 only guarantees correct rounding for
  * +,-,*,/,sqrt — `ln` differs in the last ulp across engines, which
  * breaks a bit-exact oracle. We score with the difference of
  * Laplace-smoothed class probabilities instead:
  *   w(b) = (a_b+1)/(aTot+B)·B − (c_b+1)/(cTot+B)·B
  * Every input is an exact int64, every op is correctly rounded, and the
  * evaluation order is pinned, so both engines produce identical bits.
  * Per bucket, sign(w) == sign of the log-odds (p > q ⇔ ln(p/q) > 0);
  * magnitudes weight high-probability buckets more than log-odds would —
  * a documented surrogate, not an approximation error. Weights are then
  * quantized to integer micro-units (floor(x·1e6 + 0.5) — the repo's
  * pinned rounding) and per-doc scores are exact BIGINT sums, immune to
  * double summation order.
  */
object Classify {

  /** Quantized probability-difference weight for every bucket in [0, B):
    * counts zero-filled, totals cross-joined (1 row, broadcast). The
    * arithmetic is parenthesized exactly as the oracle SQL writes it. */
  private def microWeights(counts: DataFrame, aCol: String, cCol: String,
                           aTot: String, cTot: String, buckets: Int): DataFrame = {
    val totals = counts.agg(
      sum(col(aCol)).as(aTot), sum(col(cCol)).as(cTot))
    val full = counts.sparkSession.range(buckets).toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq(aCol, cCol))
      .crossJoin(broadcast(totals))
    val b = buckets
    val wd =
      ((col(aCol) + lit(1L)).cast("double") /
        (col(aTot) + lit(b.toLong)).cast("double")) * lit(b.toDouble) -
      ((col(cCol) + lit(1L)).cast("double") /
        (col(cTot) + lit(b.toLong)).cast("double")) * lit(b.toDouble)
    full.select(col("bucket"),
      floor(wd * lit(1e6) + lit(0.5)).cast("long").as("w_micro"))
  }

  /** The bound-toks reuse contract on the classifier side (the
    * TextAnalysis.boundToksCol twin): reuse a caller-bound `toks` column
    * when present — so the Curate cjk mode's classifier gate scores CJK
    * bigram tokens instead of re-tokenizing latin from text (pure-CJK
    * docs got 0 tokens, score 0, pred=false — the gate silently dropped
    * the whole zh corpus) — else tokenize latin-fused. */
  private def boundToks(df: DataFrame): Column =
    if (df.columns.contains("toks")) col("toks")
    else tokensFused(col("text"))

  /** `pre` must carry the `carry` columns plus `text` (and optionally a
    * bound `toks`). */
  private def unigramBuckets(pre: DataFrame, carry: Seq[String], buckets: Int): DataFrame =
    pre.select(carry.map(col) :+
        explode(boundToks(pre)).as("tok"): _*)
      .withColumn("bucket",
        pmod(hash32(concat(lit("qc:"), col("tok"))), lit(buckets.toLong)))
      .drop("tok")

  /** `pre` must carry the `carry` columns plus `text` (and optionally a
    * bound `toks`). The token array is bound before the zip_with lambda
    * (HOF re-inline invariant). */
  private def bigramBuckets(pre: DataFrame, carry: Seq[String], buckets: Int): DataFrame =
    pre.select(carry.map(col) :+ boundToks(pre).as("toks"): _*)
      // greatest(…, 0): a zero-token doc would pass length −1 to slice,
      // which THROWS — empty/null text must contribute no bigrams, not
      // fail the job
      .select(carry.map(col) :+ explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("bg"): _*)
      .withColumn("bucket",
        pmod(hash32(concat(lit("ir:"), col("bg"))), lit(buckets.toLong)))
      .drop("bg")

  /** Train the unigram quality classifier on a labeled frame: hashed
    * token occurrences counted per class, weights per [[microWeights]].
    * Returns all `buckets` rows (bucket, w_micro) — broadcastable. The
    * training frame's tokenization mode (graft.functions.TokMode.of —
    * "latin" for an unbound frame, the tag for a TokMode.bind-bound one)
    * is stamped on the `w_micro` column, so mode-checked gates
    * (Curate/CurateStream) can refuse a weight table trained in the
    * wrong token space instead of silently scoring a disjoint vocab. */
  def trainTokenWeights(train: DataFrame, label: Column,
                        buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val mode = graft.functions.TokMode.of(train)
    val toksCols = if (train.columns.contains("toks")) Seq(col("toks")) else Nil
    val tb = unigramBuckets(
      // NULL labels are EXCLUDED, not defaulted: when(pos, …).otherwise
      // would silently count an unlabeled row (outer-join leftover) as a
      // negative example and skew the weights — identity-less rows don't
      // get to be training signal (the BucketedUpsert NULL-pk posture)
      train.select(Seq(label.cast("boolean").as("pos"), col("text")) ++ toksCols: _*)
        .filter(col("pos").isNotNull),
      Seq("pos"), buckets)
    val counts = tb.groupBy(col("bucket")).agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("pos_b"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("neg_b"))
    microWeights(counts, "pos_b", "neg_b", "pos_tot", "neg_tot", buckets)
      .withMetadata("w_micro", graft.functions.TokMode.metadataFor(mode))
  }

  /** Score every doc with a trained weight table: exploded tokens join
    * the broadcast weights on the hashed bucket, summed exactly as
    * BIGINT micro-units. `pred` = score > 0 (the keep decision). Docs
    * with no tokens score 0. One scan + one doc-keyed shuffle. */
  def scoreTokens(docs: DataFrame, weights: DataFrame,
                  buckets: Int = 1024): DataFrame = {
    // the mode contract enforced at the Curate/CurateStream entrances,
    // mirrored here for DIRECT callers (round-11 ADVICE): a weight table
    // stamped by trainTokenWeights refuses a docs frame whose effective
    // tokenization mode (TokMode.of — "latin" when unbound) differs,
    // instead of silently scoring a disjoint vocab through arbitrary
    // hash buckets. Untagged weight tables (manual frames) pass through:
    // nothing proves their mode either way.
    val wMode = graft.functions.TokMode.ofWeights(weights)
    val dMode = graft.functions.TokMode.of(docs)
    require(wMode == graft.functions.TokMode.Unknown || wMode == dMode,
      s"scoreTokens tokenization mode mismatch: the weight table was trained " +
        s"in '$wMode' mode but the docs frame scores in '$dMode' — bind the " +
        "docs via graft.functions.TokMode.bind(docs, cjk = <training mode>)")
    val toksCols = if (docs.columns.contains("toks")) Seq(col("toks")) else Nil
    val db = unigramBuckets(
      docs.select(Seq(col("doc_id"), col("text")) ++ toksCols: _*),
      Seq("doc_id"), buckets)
    val scored = db.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w_micro")).as("score_micro"),
        count(lit(1)).as("n_tokens"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
      .withColumn("pred", col("score_micro") > 0)
  }

  /** DSIR-flavored importance score per doc: hashed BIGRAM occurrences
    * scored by target-vs-raw probability difference (raw = the whole
    * corpus, target ⊆ raw — the paper's hashed-n-gram setup with the
    * engine-parity surrogate above). One corpus scan builds the B-row
    * count table (target count + raw count share the aggregation); a
    * second scan scores through the broadcast weights. Docs with < 2
    * tokens have no bigrams and score 0. */
  def importanceWeights(docs: DataFrame, target: Column,
                        buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val bb = bigramBuckets(
      docs.select(Seq(col("doc_id"), target.cast("boolean").as("tgt"), col("text")) ++
        (if (docs.columns.contains("toks")) Seq(col("toks")) else Nil): _*),
      Seq("doc_id", "tgt"), buckets)
    val counts = bb.groupBy(col("bucket")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("tgt_b"),
      count(lit(1)).as("raw_b"))
    val weights = microWeights(counts, "tgt_b", "raw_b", "tgt_tot", "raw_tot", buckets)
    val scored = bb.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w_micro")).as("score_micro"),
        count(lit(1)).as("n_bigrams"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  /** Deterministic selection: the n highest-scoring docs under the total
    * order (score desc, doc_id asc), ranked 1..n. The sort+limit plans
    * as TakeOrderedAndProject (per-partition heaps, n-row driver merge);
    * the rank window runs over the n survivors only — the vocabulary
    * pattern, no global sort. DSIR samples ∝ exp(score); top-n is the
    * deterministic (temperature→0) limit, and a seeded-hash Gumbel
    * variant would slot into the same shape. */
  def selectTopN(scored: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    Ranks.topN(scored, Seq(col("score_micro").desc, col("doc_id").asc), n)
  }
}
