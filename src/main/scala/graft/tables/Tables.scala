package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * All engine pipelines are functions of these DataFrames; at cluster scale
  * the same loaders would point at a distributed store — the parquet reader
  * already gives vectorized scans, predicate pushdown and column pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Opt-in table cache (Bench SPARK_GRAFT_CACHE=1). Measured SLOWER than
    * direct parquet at sf0.1 (see Bench): InMemoryRelation loses pushdown +
    * vectorized-scan advantages and the OS page cache already absorbs
    * repeat I/O. Kept as a seam because on a real cluster with remote
    * object storage the tradeoff reverses (network round-trips dominate,
    * not decode). */
  @volatile var cacheEnabled: Boolean = false
  // keyed by applicationId too: a cached DataFrame is bound to its session,
  // and serving one from a stopped session would throw on first action
  private val cached =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (cacheEnabled)
      cached.getOrElseUpdate((spark.sparkContext.applicationId, sfDir, name),
        spark.read.parquet(s"$sfDir/$name.parquet").persist())
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    * reader only accepts as a long (spark.sql.legacy.parquet.nanosAsLong=true,
    * set by GraftSession). Normalize to TimestampType (µs, truncating ns) so
    * every pipeline sees a plain event-time column.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(load(s, d, "events"))

  /** ns-long `ts` -> TimestampType (µs, truncating). Shared by the batch
    * loader and streaming file sources (which must read the raw schema).
    * `div` (integer division), NOT `/`: epoch-ns longs exceed double's
    * 53-bit mantissa, and `(ts / 1000).cast("long")` routes through double
    * division — measured 12.3% of real testdata rows land 1µs off the
    * exact truncation (and off DuckDB's exact ns->µs date_trunc). */
  def normalizeEvents(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // a session without GraftSession's inferTimestampNTZ=false reads the
      // µs isAdjustedToUTC=false generation as TIMESTAMP_NTZ; the cast is
      // value-preserving under the UTC session timezone
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
