package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BpeTrainer, TextAnalysis}

/** The k-independence contract of the BPE pair: the trainer's incremental
  * pair-count maintenance must equal a from-scratch recount every round,
  * and the encoder's plan must stay one fixed-size projection at any merge
  * count. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Naive reference trainer: per round recompute every pair count from
    * every word's current sequence (the distributed formulation's exact
    * semantics), argmax with ties by pair ascending, three-pass replace. */
  private def referenceTrain(wf: Seq[(String, Long)], k: Int): Seq[(Long, String, String, Long)] = {
    var seqs = wf.map { case (w, f) => (" " + w.split("").mkString(" ") + " ", f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < k && !done) {
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      seqs.foreach { case (s, f) =>
        val syms = s.trim.split(" ").filter(_.nonEmpty)
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          val key = p(0) + " " + p(1)
          cnt.update(key, cnt.getOrElse(key, 0L) + f)
        }
      }
      if (cnt.isEmpty) done = true
      else {
        val (pair, c) = cnt.toSeq.minBy { case (p, n) => (-n, p) }
        val merged = pair.replace(" ", "")
        out += ((r.toLong, pair, merged, c))
        val pat = " " + pair + " "
        val rep = " " + merged + " "
        seqs = seqs.map { case (s, f) =>
          (s.replace(pat, rep).replace(pat, rep).replace(pat, rep), f)
        }
        r += 1
      }
    }
    out.toSeq
  }

  test("incremental trainer == from-scratch recount for 30 rounds (chains included)") {
    // same-pair chains ("aaaaaaaaaa") exercise the 3-pass residue rule and
    // the re-pickable-pair path; shared substrings exercise delta updates
    val wf = Seq(
      ("aaaaaaaaaa", 7L), ("aaab", 5L), ("ab", 9L), ("abab", 4L),
      ("banana", 6L), ("bananas", 3L), ("cabana", 2L), ("nan", 8L),
      ("deed", 5L), ("deeded", 2L), ("x", 10L), ("xyxyxy", 3L),
      ("zzz", 4L), ("z", 1L))
    val want = referenceTrain(wf, 30)
    val got = BpeTrainer.train(wf.toArray, 30)
    assert(got === want)
    assert(got.length > 10, "the corpus must survive >10 merge rounds to be a real test")
  }

  test("trainer early-stops exactly when the reference does") {
    val wf = Seq(("ab", 3L), ("a", 5L), ("b", 2L))
    assert(BpeTrainer.train(wf.toArray, 50) === referenceTrain(wf, 50))
    assert(BpeTrainer.train(Array(("a", 5L)), 3) === Seq.empty)
    assert(BpeTrainer.train(Array.empty[(String, Long)], 3) === Seq.empty)
  }

  test("bpeMerges maxWordTypes caps deterministically (f desc, w asc)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa aa bb bb cc"), (2L, "aa bb cc dd")).toDF("doc_id", "text")
    // full table: aa=4 bb=3 cc=2 dd=1; cap 2 keeps {aa, bb} only
    val capped = TextAnalysis.bpeMerges(docs, k = 3, maxWordTypes = 2).collect()
      .map(r => (r.getString(1), r.getLong(3))).toSeq
    val wantFirst = ("a a", 7L) // aa(4) and bb(3) both contribute an adjacent pair
    assert(capped.head._1 === wantFirst._1 || capped.head._1 === "b b")
    // dd's pair ("d d" doesn't exist; "dd" is two symbols d d) must be absent
    assert(!capped.exists(_._1 == "d d"), "capped-out word types must not contribute pairs")
  }

  test("the DEFAULT word-type collect is capped (uncapped is explicit opt-in)") {
    import spark.implicits._
    // the loud-failure-over-silent-wrong standard at 100 TB: a web
    // corpus's word-type count is unbounded, so the driver collect must
    // be bounded unless the caller explicitly passes 0
    assert(TextAnalysis.DefaultMaxWordTypes === 1000000)
    // the default cap is invisible on bounded vocabularies: default ==
    // explicit uncapped on a corpus with < DefaultMaxWordTypes types
    val docs = Seq((1L, "aa aa aa bb bb cc"), (2L, "aa bb cc dd")).toDF("doc_id", "text")
    val dflt = TextAnalysis.bpeMerges(docs, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val uncapped = TextAnalysis.bpeMerges(docs, k = 3, maxWordTypes = 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(dflt === uncapped)
  }

  test("k=256 encode: one fixed-size codegen'd projection, correct segmentation") {
    import spark.implicits._
    // 256 synthetic merges over a disjoint symbol space + 2 real ones
    val real = Seq("h i" -> "hi", "hi t" -> "hit")
    val fake = (0 until 254).map(i => s"q$i q$i" -> s"q${i}q$i")
    val merges = real ++ fake
    assert(merges.length === 256)
    // plan-shape assertions need a non-local source (a tiny Seq collapses
    // to LocalTableScan via ConvertToLocalRelation and never plans)
    val real_docs = spark.read.parquet(SparkTestSession.sf0001 + "/documents.parquet")
    val plan = TextAnalysis.bpeEncode(real_docs, merges)
      .queryExecution.executedPlan.toString
    // `*(n)` marks a WholeStageCodegen stage in the executed-plan string
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"encode fell out of codegen:\n$plan")
    // k-independence: the plan embeds ONE opaque codec reference, not a
    // k-deep replace chain — at 256 merges the old form exceeded 100k
    // chars of plan text; bound generously to catch any re-inlining
    assert(plan.length < 20000, s"plan size grew with k (len=${plan.length})")
    val docs = Seq((0L, "hit me hi"), (1L, "hi")).toDF("doc_id", "text")
    val rows = TextAnalysis.bpeEncode(docs, merges).orderBy("doc_id").collect()
    assert(rows(0).getAs[String]("encoded") === "hit | m e | hi")
    assert(rows(0).getAs[Long]("n_subwords") === 4L)
    assert(rows(1).getAs[String]("encoded") === "hi")
  }

  test("train k=60 on real docs, encode round-trips through the native expression") {
    val docs = spark.read.parquet(SparkTestSession.sf0001 + "/documents.parquet")
    // (the sf0.001 vocabulary fully merges after ~89 rounds — early stop —
    // so 60 exercises a deep learned sequence that still fills the quota)
    val mergesDf = TextAnalysis.bpeMerges(docs, k = 60)
    val merges = mergesDf.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length === 60, s"expected 60 merges, got ${merges.length}")
    assert(merges.map(_._2).distinct.length === 60, "merged symbols must be distinct")
    val enc = TextAnalysis.bpeEncode(docs, merges)
    val agg = enc.agg(
      sum(col("n_subwords")).as("subs"), sum(col("n_words")).as("words")).collect()(0)
    assert(agg.getLong(0) > 0 && agg.getLong(0) >= agg.getLong(1),
      "every word must produce at least one subword")
    // the last-learned merge must actually appear in some encoding
    val last = merges.last._2
    val hit = enc.filter(
      col("encoded").contains(" " + last + " ") ||
      col("encoded").startsWith(last + " ") || col("encoded").endsWith(" " + last) ||
      col("encoded") === last).count()
    assert(hit > 0, s"merge '$last' learned from the corpus but never used encoding it")
  }
}
