package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text kernel for the document-processing operators.
  *
  * Everything here is built from `org.apache.spark.sql.functions._` (so it
  * stays inside whole-stage codegen — no Scala UDFs in the hot path) and is
  * deliberately re-expressible in ANSI SQL so the DuckDB oracle can verify
  * each operator bit-for-bit.
  *
  * Tokenizer semantics are PINNED (the one semantic substitution noted in
  * SURVEY.md §7.4 for the reference's IK analyzer,
  * gmall-realtime-self/.../util/KeywordUtil.java:13-35): lowercase, split on
  * runs of non-[a-z0-9], drop empties.
  */
object TextFunctions {

  /** Pinned tokenizer: lowercase, split on non-alphanumeric runs, drop "". */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Distinct token set (order-free; use array_sort for deterministic output). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word-level n-gram shingles: ["a","b","c"] with n=2 -> ["a b","b c"]. */
  def wordShingles(toks: Column, n: Int): Column =
    filter(
      transform(toks, (_, i) => array_join(slice(toks, i + 1, lit(n)), " ")),
      (_, i) => i <= size(toks) - n)

  /** One MinHash signature: min over the token set of md5(seed || ":" || tok).
    * Hex-string min is total-ordered identically in Spark and DuckDB, so the
    * signature is engine-portable without sharing a hash implementation.
    */
  def minhashSig(tokenSet: Column, seed: Int): Column =
    array_min(transform(tokenSet, t => md5(concat(lit(s"$seed:"), t))))

  /** Document fingerprint: md5 over whitespace-normalized lowercased text. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** 32-bit SimHash over a token set.
    *
    * Per token, bit b is extracted from hex digit b/4 of md5(token)
    * (`conv(digit,16,10)` then shift/mask); the simhash bit is the sign of
    * the +1/-1 vote sum across tokens. Built as one static expression tree
    * (32 array folds) — a pure projection, no shuffle, no UDF — so it
    * vectorizes per partition and is re-expressible in the DuckDB oracle.
    */
  def simhash32(tokenSet: Column): Column = {
    val hashes = transform(tokenSet, t => md5(t))
    (0 until 32).map { b =>
      val voteSum = aggregate(hashes, lit(0), (acc, h) => {
        val v = conv(substring(h, b / 4 + 1, 1), 16, 10).cast("int")
        acc + (shiftright(v, 3 - b % 4).bitwiseAND(lit(1)) * 2 - 1)
      })
      when(voteSum >= 0, lit(1L << (31 - b))).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
