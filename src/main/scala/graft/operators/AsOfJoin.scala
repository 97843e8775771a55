package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Event-time AS-OF join — the operator Spark lacks natively (the guide's
  * canonical custom-operator example; the reference's temporal join J3 is
  * its processing-time cousin).
  *
  * For each left row, attach the LATEST right row of the same key with
  * right_ts <= left_ts. Implemented as the classic single-shuffle
  * union+window formulation rather than join+rank: tag both sides, union,
  * sort per key by (ts, side), carry the last right payload forward with
  * last_value(ignoreNulls) over rows-unbounded-preceding, keep left rows.
  * One exchange on the key, zero row blowup — at 100 TB this is the only
  * formulation that works (join+filter+rank materializes every
  * left×earlier-right pair).
  */
object AsOfJoin {

  /** @param left       left side; must contain `key` and `leftTs`
    * @param right      right side; must contain `key` and `rightTs`
    * @param key        equi-join key column name (same on both sides)
    * @param payloadCol right column to attach (null when no right row yet)
    */
  def asOf(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      key: String, payloadCol: String): DataFrame = {
    // the payload rides inside a single-field struct: the struct is the
    // "right row exists here" marker (non-null for every right row, null
    // for left markers), so last(ignoreNulls) skips left rows WITHOUT
    // also skipping right rows whose payload value is legitimately null
    val pStruct = new StructType().add("v", right.schema(payloadCol).dataType)
    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pStruct))
    // equi-join semantics for NULLs: a right row with a NULL timestamp
    // has no as-of position (it would sort FIRST and leak its payload
    // onto every left row with no genuine match), and a NULL key never
    // equi-joins — both are dropped from the right side; NULL-key left
    // rows then see only left markers in their window and emit a NULL
    // payload, exactly like the join+filter formulation
    val r = right.filter(col(rightTs).isNotNull && col(key).isNotNull)
      .select(col(key), col(rightTs).as("__ts"),
        struct(col(payloadCol).as("v")).as("__p"))
      .withColumn("__side", lit(0))
    val unioned = l.select((col(key) +: left.columns.filter(_ != key).map(col).toSeq
      :+ col("__ts") :+ col("__side") :+ col("__p")): _*)
      .unionByName(r.select(col(key), col("__ts"), col("__side"), col("__p")), allowMissingColumns = true)
    // right rows sort before left rows at equal ts => ties are inclusive
    // (right_ts == left_ts matches), like DuckDB ASOF JOIN. The payload
    // hash is the FINAL order key: two right rows at the same (key, ts)
    // would otherwise sort by physical partition order and last() would
    // return either payload run-to-run — the pinned-tie-break rule every
    // ranking in the repo follows (deterministic: highest hash wins)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), xxhash64(col("__p")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__p")
      .withColumnRenamed("__asof", s"asof_$payloadCol")
  }
}
