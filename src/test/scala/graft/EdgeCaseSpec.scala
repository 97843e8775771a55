package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Degenerate-input robustness: operators must not throw on empty or
  * pathological inputs (at 100 TB, some partition somewhere WILL be
  * empty/garbage).
  */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  private def weirdDocs = {
    import spark.implicits._
    Seq((1L, ""), (2L, "   "), (3L, "!!!"), (4L, "a b"), (5L, "one two three four"))
      .toDF("doc_id", "text")
  }

  test("dedup operators on empty input return empty, not error") {
    assert(Dedup.exactGroups(emptyDocs).count() === 0)
    assert(Dedup.minhashLshPairs(emptyDocs).count() === 0)
    assert(Dedup.simhashTable(emptyDocs).count() === 0)
  }

  test("dedup operators on degenerate docs: short/empty texts drop cleanly") {
    // only doc 5 has >= 3 tokens -> it alone shingles; no pairs
    assert(Dedup.shingleSets(weirdDocs).count() === 1)
    assert(Dedup.minhashLshPairs(weirdDocs).count() === 0)
    // simhash: docs with zero tokens produce no row (explode semantics)
    assert(Dedup.simhashTable(weirdDocs).count() === 2)
    // exact dedup: "" and "   " normalize to the same fingerprint
    val groups = Dedup.exactGroups(weirdDocs).collect()
    assert(groups.map(_.getLong(1)).sum === 5)
    assert(groups.exists(_.getLong(1) === 2))
  }

  test("text analysis on degenerate docs") {
    assert(TextAnalysis.qualityScore(weirdDocs).count() === 2) // token-bearing docs only
    assert(TextAnalysis.langId(weirdDocs).count() === 5)
    val stats = TextAnalysis.tokenStats(weirdDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats(1L) === 0 && stats(4L) === 2)
  }

  test("multimodal and n-gram langid on degenerate/null docs") {
    import spark.implicits._
    val nullDocs = Seq((1L, null.asInstanceOf[String]), (2L, "hello world"))
      .toDF("doc_id", "text")
    assert(Multimodal.extractMeta(spark, Multimodal.asBinary(weirdDocs)).count() === 5)
    // "" yields zero frames; the other four docs yield one frame each
    assert(Multimodal.frameSample(spark, Multimodal.asBinary(weirdDocs)).count() === 4)
    assert(Multimodal.resize(spark, Multimodal.asBinary(weirdDocs)).count() === 5)
    assert(Multimodal.extractMeta(spark, Multimodal.asBinary(nullDocs)).count() === 2)
    assert(TextAnalysis.langIdNgram(nullDocs).count() === 2)
    assert(TextAnalysis.langIdNgram(weirdDocs).count() === 5)
    assert(TextAnalysis.langId(nullDocs).count() === 2)
  }

  test("as-of join attaches a null right payload instead of a stale value") {
    import spark.implicits._
    val left = Seq((1L, 25L)).toDF("k", "lts")
    val right = Seq((1L, 10L, Some(5.0)), (1L, 20L, None)).toDF("k", "rts", "p")
    val got = graft.operators.AsOfJoin.asOf(left, "lts", right, "rts", "k", "p")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // the matched row is (k, ts=20, p=NULL) — not the older p=5.0
    assert(got.toSeq === Seq((1L, None)))
  }

  test("similarity on empty query set returns empty") {
    import spark.implicits._
    val emb = graft.tables.Tables.embeddings(spark, SparkTestSession.sf0001)
    val emptyQ = emb.filter(col("vec_id") < 0)
    assert(Similarity.bruteForceTopK(emb, emptyQ, 5).count() === 0)
  }
}
