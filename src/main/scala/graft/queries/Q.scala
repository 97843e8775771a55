package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark pipeline plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL the driver hash-compares against.
  * Column names/aliases MUST match between `run` and `oracle`.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are the ones Bench times */
    headline: Boolean = false)
