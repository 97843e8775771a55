package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session configuration so Verify, Bench and the
  * test suites run identical settings.
  *
  * Scale notes (targets a 1000-executor cluster even though we test on
  * local[N]): AQE on (runtime coalescing + skew-join splitting), shuffle
  * partitions sized to cores locally (the cluster deployment would size to
  * 2-3× total cores), UTC session time so event-time logic is zone-explicit
  * (the reference hard-codes +8, DateFormatUtil.java:22 — we parameterize).
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // events.parquet has carried two physical types across testdata
    // generations: TIMESTAMP(NANOS), which Spark's reader only accepts as a
    // long (nanosAsLong, normalized in Tables.events), and
    // TIMESTAMP(MICROS, isAdjustedToUTC=false), which would otherwise
    // surface as TIMESTAMP_NTZ and break every TimestampType consumer —
    // inferTimestampNTZ=false reads it as plain TIMESTAMP (the session is
    // UTC, so the wall-clock values are identical to DuckDB's naive read).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.parquet.compression.codec", "snappy")
    // note: the test-SF parquets are single-row-group files, so scans are
    // one task regardless of maxPartitionBytes (parquet splits only on
    // row-group boundaries — measured no gain from smaller splits); the
    // default 128 MB split is kept, which is also the cluster-scale choice.
    .config("spark.ui.enabled", "false")

  /** local[cores] session; cores defaults to SPARK_GRAFT_CPUS or 4. */
  def local(appName: String, cores: Option[String] = None): SparkSession = {
    val cpus = cores.getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    spark
  }
}
