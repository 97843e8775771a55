package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** Deterministic sampling and split assignment for training corpora.
  *
  * Every decision derives from the md5-prefix hash of the row's KEY, so
  * assignments are (a) reproducible across runs, engines and cluster
  * sizes (no RNG, no partition-order dependence — Spark's own
  * `sample()`/`randomSplit()` are partition-order-sensitive and can't be
  * oracle-checked), (b) stable under corpus growth: adding documents
  * never reassigns an existing one, the property that keeps a frozen
  * eval split honest across dataset versions. Pure projections — at
  * 100 TB these run at scan speed, no shuffle.
  */
object Sampling {

  private val Buckets = 10000L

  /** NULL-safe key string: a NULL key (or stratum) hashes as the empty
    * string instead of poisoning the whole hash to NULL — without this a
    * NULL-keyed row silently fails every `bucket < threshold` filter and
    * vanishes from samples/strata, contradicting the documented rates
    * (and in assignSplits would fall through to the last split). */
  private def keyStr(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** Uniform hash bucket in [0, 10000): md5-prefix of the key string,
    * engine-portable (DuckDB: `('0x'||substr(md5(k),1,8))::BIGINT % 10000`). */
  private def bucket(key: Column): Column = pmod(hash32(keyStr(key)), lit(Buckets))

  /** Assign every row to a named split by hash bucket: `splits` are
    * (name, weight) with weights summing to 1.0; a row lands in the split
    * whose cumulative-weight interval contains its bucket. Deterministic
    * per key — the canonical train/val/test carve. */
  def assignSplits(df: DataFrame, key: Column, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1.0, got ${splits.map(_._2).sum}")
    val b = bucket(key)
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      .map(f => math.round(f * Buckets))
    val expr = splits.zip(bounds).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(b < hi, name))(_.when(b < hi, name)))
    }.get.otherwise(splits.last._1) // rounding guard: bucket 9999 edge
    df.withColumn("split", expr)
  }

  /** Deterministic Bernoulli sample at `rate`: keep rows whose seeded
    * bucket falls under rate·10000. The seed participates in the hash so
    * independent samples of the same corpus don't select nested subsets. */
  def sampleByHash(df: DataFrame, key: Column, rate: Double, seed: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(bucket(concat(lit(seed), lit(":"), keyStr(key)))
      < math.round(rate * Buckets))
  }

  /** Per-stratum deterministic sampling: each row's keep decision uses the
    * rate of ITS stratum value (source/language/domain re-weighting — the
    * standard corpus-mixing move). The stratum participates in the hash,
    * so strata sample independently even for equal keys. Unlisted strata
    * fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Seq[(String, Double)], defaultRate: Double = 1.0): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0.0 && r <= 1.0),
      "all rates must be in [0,1]")
    val rate = rates.foldLeft(Option.empty[Column]) {
      case (acc, (s, r)) =>
        Some(acc.fold(when(stratum === s, r))(_.when(stratum === s, r)))
    }.fold(lit(defaultRate))(_.otherwise(defaultRate))
    // NULL stratum already falls to defaultRate via the when-chain; the
    // hash must stay NULL-safe too or the row is dropped regardless of rate
    val b = bucket(concat(keyStr(stratum), lit(":"), keyStr(key)))
    df.filter(b < round(rate * Buckets).cast("long"))
  }

  /** Deterministic sequence packing for training: documents are bucketed
    * into `shards` by doc_id hash, laid out in doc_id order within each
    * shard as one contiguous token stream, and assigned to the pack where
    * their FIRST token lands (pack i covers stream offsets
    * [i·budget, (i+1)·budget)). This is contiguous offset-chunking, not
    * bin packing: a pack can overflow by at most one straddling document —
    * the standard concat-then-cut layout training loaders use, where the
    * loader's final cut (not the distributed layout) enforces exact
    * sequence lengths.
    *
    * Scale: the only wide op is the per-shard running token sum — a window
    * PARTITIONED BY shard (parallelism = `shards`; size it to ~cores at
    * the target scale). Deterministic like the rest of this file: hash
    * sharding + doc_id order, no RNG, no partition-order dependence.
    * Under APPEND-ONLY ingestion (every new doc_id above all existing
    * ones, the normal monotonic-id regime) growth only extends each
    * shard's stream, so earlier packs are byte-stable; a backfilled doc
    * with an out-of-order id inserts mid-stream and reassigns the packs
    * behind it in that shard — re-cut downstream packs after backfills. */
  def packSequences(docs: DataFrame, budget: Long, shards: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val n = size(graft.functions.TextFunctions.tokens(coalesce(col("text"), lit("")))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col("doc_id"), n.as("n_tokens"),
        pmod(hash32(col("doc_id").cast("string")), lit(shards.toLong)).as("shard"))
      // start offset = running sum minus own length; floor over DOUBLE is
      // IEEE-exact for token counts < 2^52 and matches DuckDB bit-for-bit
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")).cast("double") / budget)
          .cast("long"))
      .select(col("doc_id"), col("shard"), col("pack_id"), col("n_tokens"))
  }
}
