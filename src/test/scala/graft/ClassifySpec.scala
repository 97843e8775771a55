package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Classify, TextAnalysis}

class ClassifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsDF(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("classifier separates disjoint vocabularies and covers every bucket") {
    val train = docsDF(Seq(
      (0L, "good clean prose flows here", "en"),
      (1L, "good clean writing again here", "en"),
      (2L, "spam junk noise garbage", "xx"),
      (3L, "junk spam noise refuse", "xx")))
    val w = Classify.trainTokenWeights(train, col("lang") === "en", buckets = 64)
    assert(w.count() === 64, "weight table must cover all buckets")
    val test = docsDF(Seq(
      (10L, "good clean prose", "?"),
      (11L, "spam junk noise", "?"),
      (12L, "", "?")))
    val got = Classify.scoreTokens(test, w, buckets = 64)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Boolean]("pred"), "positive-vocab doc must score > 0")
    assert(!got(1).getAs[Boolean]("pred"), "negative-vocab doc must score <= 0")
    assert(got(2).getAs[Long]("n_tokens") === 0L &&
      got(2).getAs[Long]("score_micro") === 0L && !got(2).getAs[Boolean]("pred"),
      "empty doc scores exactly 0")
  }

  test("scoreTokens refuses a weight/docs tokenization-mode mismatch (both directions)") {
    // the Curate-entrance contract, mirrored at the DIRECT scoreTokens
    // call site (round-11 ADVICE): tagged weights + wrong-mode docs must
    // refuse loudly instead of scoring a disjoint vocab
    val train = docsDF(Seq(
      (0L, "good clean prose flows here", "en"),
      (1L, "spam junk noise garbage", "xx")))
    val wCjk = Classify.trainTokenWeights(
      graft.functions.TokMode.bind(train, cjk = true), col("lang") === "en", buckets = 32)
    val wLatin = Classify.trainTokenWeights(
      graft.functions.TokMode.bind(train, cjk = false), col("lang") === "en", buckets = 32)
    val docs = docsDF(Seq((10L, "good clean prose", "?")))
    // cjk weights vs unbound docs (effective latin): refused
    val e1 = intercept[IllegalArgumentException] {
      Classify.scoreTokens(docs, wCjk, buckets = 32)
    }
    assert(e1.getMessage.contains("mode mismatch"))
    // latin weights vs cjk-bound docs: refused
    val e2 = intercept[IllegalArgumentException] {
      Classify.scoreTokens(graft.functions.TokMode.bind(docs, cjk = true), wLatin, buckets = 32)
    }
    assert(e2.getMessage.contains("mode mismatch"))
    // matching modes pass; untagged manual weight frames pass through
    assert(Classify.scoreTokens(
      graft.functions.TokMode.bind(docs, cjk = true), wCjk, buckets = 32).count() === 1)
    val manual = wLatin.select(col("bucket"), (col("w_micro") + 0L).as("w_micro"))
    assert(Classify.scoreTokens(docs, manual, buckets = 32).count() === 1)
  }

  test("score is the exact BIGINT sum of per-token bucket weights") {
    val train = docsDF(Seq(
      (0L, "alpha beta gamma", "en"), (1L, "delta epsilon zeta", "xx")))
    val w = Classify.trainTokenWeights(train, col("lang") === "en", buckets = 32)
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hash = (tok: String) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("qc:" + tok).getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 32
    }
    val doc = "alpha alpha zeta unseen"
    val want = doc.split(" ").map(t => wm(hash(t))).sum
    val got = Classify.scoreTokens(docsDF(Seq((5L, doc, "?"))), w, buckets = 32)
      .collect()(0).getAs[Long]("score_micro")
    assert(got === want, s"$got vs manual $want")
  }

  test("importance weights favor target-domain bigrams; short docs score 0") {
    val docs = docsDF(Seq(
      (0L, "solar panel array output", "en"),
      (1L, "solar panel grid output", "en"),
      (2L, "random other words entirely", "xx"),
      (3L, "one", "xx")))
    val got = Classify.importanceWeights(docs, col("lang") === "en", buckets = 64)
      .orderBy("doc_id").collect()
    assert(got.length === 4, "every doc gets a score row")
    assert(got(0).getAs[Long]("score_micro") > got(2).getAs[Long]("score_micro"),
      "target-vocab doc must outscore off-target doc")
    assert(got(3).getAs[Long]("n_bigrams") === 0L &&
      got(3).getAs[Long]("score_micro") === 0L, "single-token doc has no bigrams")
  }

  test("selectTopN is a deterministic heap plan, ranked 1..n") {
    val docs = docsDF((0L until 50L).map(i =>
      (i, if (i % 5 == 0) "solar panel array" else "other words here", if (i % 5 == 0) "en" else "xx")))
    val scored = Classify.importanceWeights(docs, col("lang") === "en", buckets = 64)
    val top = Classify.selectTopN(scored, 10)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val rows = top.collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to 10L))
    val scores = rows.map(_.getAs[Long]("score_micro")).toSeq
    assert(scores === scores.sorted.reverse, "ranked by score desc")
  }

  test("bpeEncode applies merges in rank order with the trainer's replace") {
    val docs = docsDF(Seq(
      (0L, "abab abab cd", "en"), (1L, "", "en"), (2L, "a", "en")))
    // merges learned by hand: (a b)->ab, then (ab ab)->abab
    val enc = TextAnalysis.bpeEncode(docs, Seq("a b" -> "ab", "ab ab" -> "abab"))
      .orderBy("doc_id").collect()
    assert(enc(0).getAs[String]("encoded") === "abab | abab | c d")
    assert(enc(0).getAs[Long]("n_words") === 3L)
    assert(enc(0).getAs[Long]("n_subwords") === 4L)
    assert(enc(1).getAs[String]("encoded") === "" &&
      enc(1).getAs[Long]("n_subwords") === 0L, "empty doc encodes empty")
    assert(enc(2).getAs[String]("encoded") === "a")
  }

  test("bpeEncode with no merges is character segmentation") {
    val enc = TextAnalysis.bpeEncode(docsDF(Seq((0L, "hi you", "en"))), Nil).collect()(0)
    assert(enc.getAs[String]("encoded") === "h i | y o u")
    assert(enc.getAs[Long]("n_subwords") === 5L)
  }

  test("train-encode round trip: every merged symbol appears in the encoding") {
    val docs = spark.read.parquet(SparkTestSession.sf0001 + "/documents.parquet")
    val merges = TextAnalysis.bpeMerges(docs, k = 4)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length === 4)
    val enc = TextAnalysis.bpeEncode(docs, merges)
    val corpus = enc.agg(concat_ws(" ", collect_list(col("encoded")))).collect()(0).getString(0)
    val last = merges.last._2
    assert(corpus.split("[ |]+").contains(last),
      s"merged symbol '$last' must appear as a standalone subword")
  }
}
