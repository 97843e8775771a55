package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The post-k-cut rank helper: number the survivors of a
  * `orderBy(ord).limit(n)` 1..n under the SAME total order.
  *
  * A partition-less `row_number().over(Window.orderBy(...))` computes
  * the identical thing but logs `WindowExec: No Partition Defined`
  * on every execution — harmless here (the window runs over ≤ n
  * already-cut rows, plan is TakeOrderedAndProject → tiny window) but
  * the noise would mask a REAL global-window regression in a bench
  * tail someday. Instead: force the ≤ n survivors onto one partition,
  * sort within it, and number rows with `monotonically_increasing_id`
  * (partition 0 ⇒ ids are exactly the in-partition row index, so
  * sorted order ⇒ rank order). No WindowExec, no warning, no shuffle
  * beyond the single-partition coalesce the global window needed
  * anyway.
  */
private[graft] object Ranks {

  /** `df.orderBy(ord).limit(n)` + a 1-based `rank` column consistent
    * with `ord`. `ord` must be a TOTAL order (the callers all
    * tie-break by doc_id) — equal-key rows would otherwise rank
    * arbitrarily. */
  def topN(df: DataFrame, ord: Seq[Column], n: Int): DataFrame =
    df.orderBy(ord: _*).limit(n)
      .coalesce(1)
      .sortWithinPartitions(ord: _*)
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("long"))
}
