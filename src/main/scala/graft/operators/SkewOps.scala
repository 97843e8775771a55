package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregations and joins.
  *
  * AQE's skew-join splitting (on in GraftSession) handles join skew at
  * runtime; `saltedAggregate` is the explicit two-phase pattern for
  * aggregations whose key distribution is pathological (one key >> the
  * rest): phase 1 aggregates on (key, salt) spreading a hot key over
  * `buckets` partitions, phase 2 merges the partials. Correct for any
  * algebraic aggregate (sum/count/min/max); asserted ≡ direct groupBy in
  * SkewSpec.
  */
object SkewOps {

  /** Aggregation spec: phase-1 partial expression (a ready Column — it
    * aggregates the INPUT columns it closed over) and phase-2 merge (a
    * function of the phase-1 result column). The partial used to take a
    * Column argument that every constructor ignored and the call site
    * fed the OUTPUT name — a trap for custom Aggs, which would resolve
    * the wrong column or fail. */
  final case class Agg(partial: Column, merge: Column => Column, name: String)

  object Agg {
    def sumOf(c: Column, name: String): Agg = Agg(sum(c), sum(_), name)
    def countAll(name: String): Agg = Agg(count(lit(1)), sum(_), name)
    def minOf(c: Column, name: String): Agg = Agg(min(c), min(_), name)
    def maxOf(c: Column, name: String): Agg = Agg(max(c), max(_), name)
  }

  /** Salted inner equi-join for hot-key joins where the build side is too
    * large to broadcast and a few probe keys dominate: the probe side gets
    * a salt in [0, buckets), the build side is replicated `buckets`× via
    * explode, and the join key becomes (key, salt) — a hot key's rows
    * spread over `buckets` reducers instead of one straggler task. The
    * salt value itself never affects the output (every build row exists
    * under every salt), so the result is row-identical to the plain join
    * (asserted in SkewSpec and hash-matched vs DuckDB in
    * skew_salted_join). Cost = buckets× replication of the build side —
    * size `buckets` to the observed skew, not the cluster. AQE's runtime
    * skew splitting (on by default in GraftSession) is the first line of
    * defense; this is the explicit rewrite for when a single key exceeds
    * what one task can hold. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, buckets: Int = 16): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedProbe.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation over `keys`. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], aggs: Seq[Agg], buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head.partial.as(s"p_${aggs.head.name}"),
        aggs.tail.map(a => a.partial.as(s"p_${a.name}")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(col(s"p_${aggs.head.name}")).as(aggs.head.name),
        aggs.tail.map(a => a.merge(col(s"p_${a.name}")).as(a.name)): _*)
  }
}
