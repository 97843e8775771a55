package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass exact-distinct counter as a typed Aggregator
  * (SURVEY §2.10: the reference hand-rolls distinctness with keyed state;
  * Spark's countDistinct expands to a two-exchange plan — this Aggregator
  * is the one-exchange alternative when the per-group distinct set is
  * known to be small, e.g. users per (window, key) group).
  *
  * Buffer = the distinct set; merge = union. Partial aggregation still
  * applies, so the shuffle carries one set per (group, map partition) —
  * use only where |set| per group is bounded (otherwise prefer
  * countDistinct's expanded plan or approx_count_distinct).
  */
object ExactDistinct {

  final class LongDistinct extends Aggregator[Long, Set[Long], Long] {
    override def zero: Set[Long] = Set.empty
    override def reduce(b: Set[Long], a: Long): Set[Long] = b + a
    override def merge(b1: Set[Long], b2: Set[Long]): Set[Long] = b1 | b2
    override def finish(r: Set[Long]): Long = r.size.toLong
    override def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Typed column: exact distinct count of a Long-valued extraction. */
  def distinctCount: TypedColumn[Long, Long] = new LongDistinct().toColumn
}
