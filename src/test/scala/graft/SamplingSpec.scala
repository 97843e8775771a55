package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sampling, TextAnalysis}
import graft.tables.Tables

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("assignSplits: exhaustive, disjoint, near-declared fractions, growth-stable") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val got = Sampling.assignSplits(docs, col("doc_id"), splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(got.values.sum === n) // every row assigned exactly one split
    assert(got("train") > n * 6 / 10 && got("val") > 0 && got("test") > 0)
    // growth stability: assignments on a PREFIX of the corpus are the
    // restriction of the full assignment (adding docs reassigns nobody)
    val full = Sampling.assignSplits(docs, col("doc_id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val half = Sampling.assignSplits(docs.filter(col("doc_id") < 250), col("doc_id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => full(id) == s })
  }

  test("leakageSafeSplit: clusters never straddle splits; unclustered match per-doc carve") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val pairs = graft.operators.Dedup.minhashLshPairs(docs)
    val clusters = graft.operators.Dedup.duplicateClusters(pairs).persist()
    assert(clusters.count() > 0) // fixture must actually exercise the join
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val got = Sampling.leakageSafeSplit(docs, clusters, splits).persist()
    assert(got.count() === docs.count()) // exhaustive, one row per doc
    // every near-dup PAIR lands in one split — the leakage contract
    val straddle = pairs
      .join(got.select(col("doc_id").as("doc_a"), col("split").as("s_a")), Seq("doc_a"))
      .join(got.select(col("doc_id").as("doc_b"), col("split").as("s_b")), Seq("doc_b"))
      .filter(col("s_a") =!= col("s_b")).count()
    assert(straddle === 0L)
    // docs outside any cluster carve exactly as the per-doc assignment
    val loneDocs = docs.join(clusters, Seq("doc_id"), "left_anti")
    val lone = got.join(clusters, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = Sampling.assignSplits(loneDocs.select(col("doc_id")), col("doc_id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lone === perDoc)
    got.unpersist(blocking = false); clusters.unpersist(blocking = false)
  }

  test("leakageSafeSplit growth: a bridging doc merges clusters and re-keys the losers") {
    import spark.implicits._
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val docs = Seq(1L, 2L, 5L, 6L, 9L).toDF("doc_id")
    val before = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)).toDF("doc_id", "cluster")
    // bridge pair (2,5): clusters {1,2} and {5,6} merge under label 1
    val after = Seq((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L)).toDF("doc_id", "cluster")
    def carve(cl: org.apache.spark.sql.DataFrame) =
      Sampling.leakageSafeSplit(docs, cl, splits)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val (b, a) = (carve(before), carve(after))
    // merged members all share ONE (group_key, split) — the leakage contract
    assert(Seq(1L, 2L, 5L, 6L).map(a(_)).toSet.size === 1)
    assert(a(1L) === b(1L)) // surviving-label members never move
    assert(a(9L) === b(9L)) // untouched singleton never moves
    // and the reassignment is real whenever the two labels carve apart:
    // doc 5 moved from cluster-5's split to cluster-1's (here they differ)
    assert(b(5L)._1 === 5L && a(5L)._1 === 1L)
  }

  test("assignSplits rejects weights that do not sum to 1") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, col("doc_id"), Seq(("a", 0.5), ("b", 0.2)))
    }
  }

  test("sampleByHash: deterministic, near-rate, seed-independent selections") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    def ids(seed: String) = Sampling.sampleByHash(docs, col("doc_id"), 0.3, seed)
      .collect().map(_.getLong(0)).toSet
    val a = ids("s1"); val b = ids("s1"); val c = ids("s2")
    assert(a === b) // rerun-identical
    val n = docs.count().toDouble
    assert(a.size > n * 0.2 && a.size < n * 0.4)
    assert(c !== a) // different seed => different (not nested) selection
  }

  test("stratifiedSample: per-stratum rates hold and other strata untouched") {
    val docs = Tables.documents(spark, dir)
    val kept = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Seq(("en", 0.5), ("de", 0.0)), defaultRate = 1.0)
    val byLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("de")) // rate 0 => stratum dropped entirely
    assert(byLang("en") > totals("en") * 3 / 10 && byLang("en") < totals("en") * 7 / 10)
    for (l <- Seq("fr", "es", "zh")) assert(byLang(l) === totals(l)) // untouched
  }

  test("NULL keys and strata are retained, not silently dropped") {
    import spark.implicits._
    val docs = Seq((1L, Some("en")), (2L, None), (3L, Some("de")))
      .toDF("doc_id", "lang")
    // NULL stratum must fall to defaultRate (kept at 1.0), not vanish
    val kept = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Seq(("de", 0.0)), defaultRate = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
    // NULL keys hash deterministically instead of failing every filter
    val nullKeys = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("doc_id", "k")
    assert(Sampling.sampleByHash(nullKeys, col("k"), 1.0).count() === 2)
    val splits = Sampling.assignSplits(nullKeys, col("k"), Seq(("a", 0.5), ("b", 0.5)))
      .select("split").distinct().collect().map(_.getString(0))
    assert(splits.length === 1) // same (null-sentinel) bucket for both
  }

  test("NULL stratum and empty-string stratum sample independently (sentinel, no collision)") {
    import spark.implicits._
    // the same 200 doc_ids under a NULL stratum and an '' stratum: both fall
    // to defaultRate, but their keep decisions must NOT be perfectly
    // correlated — pre-sentinel both strata hashed the identical input
    // ('': doc_id) and selected the exact same doc_ids
    val rows = (1 to 200).flatMap(i =>
      Seq((i.toLong, Option.empty[String]), (i.toLong, Some(""))))
      .toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(rows, col("doc_id"), col("lang"),
        Seq(("zz", 0.5)), defaultRate = 0.5)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val keptNull = (1 to 200).count(i => kept.contains((i.toLong, None)))
    val keptEmpty = (1 to 200).count(i => kept.contains((i.toLong, Some(""))))
    val agree = (1 to 200).count(i =>
      kept.contains((i.toLong, None)) == kept.contains((i.toLong, Some("")))) / 200.0
    // both near-rate, and agreement near 50% (independent), not 100%
    assert(keptNull > 60 && keptNull < 140, s"null-stratum kept $keptNull of 200")
    assert(keptEmpty > 60 && keptEmpty < 140, s"empty-stratum kept $keptEmpty of 200")
    assert(agree < 0.75, s"null and '' decisions ${agree * 100}% correlated")
  }

  test("repetitionScore: top_token_frac fold == naive max count; repetitive doc scores high") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam eggs"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    // doc 1: 5 tokens, 'spam' x4 -> top_token_frac 0.8; bigrams
    // [spam spam]x3 + [spam eggs] -> dup frac 1 - 2/4 = 0.5
    assert(got(1L)._1 === 5L && got(1L)._2 === 0.5 && got(1L)._3 === 0.8)
    // doc 2: 9 tokens, 'the' x2 -> 2/9
    assert(math.abs(got(2L)._3 - 2.0 / 9.0) < 1e-12)
  }

  test("contaminationTable: flags exactly the docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),       // benchmark member
      (2L, "zzz alpha beta gamma delta yyy"),       // contains benchmark 4-gram
      (3L, "alpha beta delta gamma epsilon zeta"),  // same tokens, no shared 4-gram
      (4L, "one two three four five")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 1)
    val got = TextAnalysis.contaminationTable(docs, bench, n = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 self-matches on both of its 4-grams; doc 2 shares exactly one
    assert(got === Map(1L -> 2L, 2L -> 1L))
  }

  test("decontaminateSpans: excises exactly the covered positions, rebuilds the rest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),                          // the benchmark phrase
      (2L, "zzz alpha beta gamma delta yyy www"),              // phrase mid-doc
      (3L, "alpha beta delta gamma epsilon zeta"),             // same tokens, no shared 4-gram
      (4L, "one two"),                                         // shorter than n
      (5L, "")).toDF("doc_id", "text")                         // empty
    val bench = docs.filter(col("doc_id") === 1)
    val got = TextAnalysis.decontaminateSpans(docs, bench, n = 4).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 is fully self-covered; doc 2 loses tokens 1..4 only
    assert(got(1L) === (("", 4L, 4L)))
    assert(got(2L) === (("zzz yyy www", 7L, 4L)))
    assert(got(3L) === (("alpha beta delta gamma epsilon zeta", 6L, 0L)))
    assert(got(4L) === (("one two", 2L, 0L)))
    assert(got(5L) === (("", 0L, 0L)))
    graft.pipeline.Curate.releaseCaches(spark)
  }

  test("decontaminateSpans: overlapping shared grams coalesce into one covered run") {
    import spark.implicits._
    // bench doc's two 4-grams overlap in the corpus doc: covered = [1..5]
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c d e y")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 1)
    val got = TextAnalysis.decontaminateSpans(docs, bench, n = 4).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(got(2L) === (("x y", 5L)))
    graft.pipeline.Curate.releaseCaches(spark)
  }

  test("decontaminateSpans: n_removed > 0 iff contaminationTable flags the doc") {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val flagged = TextAnalysis.contaminationTable(docs, bench, n = 4).collect()
      .map(_.getLong(0)).toSet
    val touched = TextAnalysis.decontaminateSpans(docs, bench, n = 4).collect()
      .filter(_.getLong(3) > 0L).map(_.getLong(0)).toSet
    assert(touched === flagged)
    graft.pipeline.Curate.releaseCaches(spark)
  }

  test("packSequences: exhaustive, contiguous per shard, bounded overflow, growth-stable") {
    val docs = Tables.documents(spark, dir)
    val budget = 512L
    val got = Sampling.packSequences(docs, budget, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === docs.count()) // every doc packed exactly once
    for ((_, rows) <- got.groupBy(_._2)) {
      val inOrder = rows.sortBy(_._1)
      // pack ids are non-decreasing in doc order and start at 0
      assert(inOrder.head._3 === 0L)
      assert(inOrder.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      // definitional check vs an independent driver-side fold: each doc's
      // pack is floor(start-offset / budget) over the shard's doc-ordered
      // contiguous token stream
      var offset = 0L
      for ((_, _, pack, n) <- inOrder) {
        assert(pack === offset / budget, s"pack mismatch at offset $offset")
        offset += n
      }
    }
    // growth stability: packing a doc_id-prefix of the corpus is the
    // restriction of the full packing (appending docs repacks nobody)
    val half = Sampling.packSequences(docs.filter(col("doc_id") < 250), budget, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val full = got.map(r => (r._1, r._3)).toMap
    assert(half.nonEmpty && half.forall { case (id, pack) => full(id) == pack })
  }

  test("packSequencesScalable == packSequences row-for-row (distributed prefix sum)") {
    val docs = Tables.documents(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // few shards + many partitions is exactly the regime the two-pass form
    // exists for (window form would serialize into 3 tasks)
    val simple = rows(Sampling.packSequences(docs, budget = 512, shards = 3))
    val scalable = rows(Sampling.packSequencesScalable(docs, budget = 512, shards = 3,
      partitions = 16))
    assert(scalable === simple)
    // and at a partition count below the shard count (degenerate splits)
    val coarse = rows(Sampling.packSequencesScalable(docs, budget = 512, shards = 8,
      partitions = 2))
    assert(coarse === rows(Sampling.packSequences(docs, budget = 512, shards = 8)))
  }

  test("packSequencesScalable: sparse and negative ids still equal the window form") {
    import spark.implicits._
    // the deterministic (doc_id - lo) div chunk sub-buckets must stay
    // order-preserving and exact on a clustered sparse id space spanning
    // negative values — the regime the fixed-width ranges are weakest in
    val ids = Seq(-900000L, -899999L, -17L, 0L, 3L, 4L, 5L,
      1000000L, 1000001L, 5000000L, 5000017L, 9999999L)
    val docs = ids.zipWithIndex
      .map { case (id, i) => (id, Seq.fill(i % 7 + 1)("tok").mkString(" ")) }
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = rows(Sampling.packSequences(docs, budget = 5, shards = 3))
    val got = rows(Sampling.packSequencesScalable(docs, budget = 5, shards = 3,
      partitions = 8))
    assert(got === want)
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("capPerStratum: quota holds per stratum, deterministic, subset of input") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    def run() = Sampling.capPerStratum(docs, col("doc_id"), col("source"), 15)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val kept = run()
    assert(kept === run()) // rerun-identical
    val perSource = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perSource.values.forall(_ <= 15))
    val totals = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept.subsetOf(totals))
    // the cap actually bites: every source holds 25 docs at this SF
    assert(perSource.values.forall(_ === 15), s"per-source: $perSource")
  }

  test("temperatureQuota flattens skewed strata; targets exact; alpha=1 passes through") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.temperatureQuota(docs, col("doc_id"), col("lang"),
        alpha = 0.5, scale = 4.0)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-stratum target is exactly floor(4*sqrt(n) + 0.5), capped by n
    for ((lang, n) <- totals)
      assert(kept(lang) === math.min(n, math.floor(4.0 * math.sqrt(n.toDouble) + 0.5).toLong),
        s"$lang: n=$n kept=${kept(lang)}")
    // flattening: en dominates the corpus ~3x but keeps < 2x of any other
    val (maxLang, maxN) = totals.maxBy(_._2)
    val others = totals.removed(maxLang)
    assert(others.values.forall(_ * 2 < maxN), "fixture no longer skewed — test is vacuous")
    assert(others.forall { case (l, _) => kept(maxLang) < 2 * kept(l) },
      s"not flattened: $kept")
    // alpha = 1, scale = 1 keeps everything (proportional pass-through)
    assert(Sampling.temperatureQuota(docs, col("doc_id"), col("lang"), alpha = 1.0)
      .count() === docs.count())
  }

  test("sampleFixed: exact budget, deterministic, seed-independent, heap plan") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    def ids(seed: String) = Sampling.sampleFixed(docs, col("doc_id"), 100, seed)
      .collect().map(_.getLong(0)).toSet
    val a = ids("s1")
    assert(a.size === 100 && a === ids("s1"))
    assert(ids("s2") !== a) // different seed, different carve
    // over-budget n returns the whole corpus
    assert(Sampling.sampleFixed(docs, col("doc_id"), 10000).count() === docs.count())
    // no global sort: the limit plans as TakeOrderedAndProject
    val plan = Sampling.sampleFixed(docs, col("doc_id"), 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("shuffleRank: dense 0-based permutation, equals the global-sort form") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val got = Sampling.shuffleRank(docs, col("doc_id"), partitions = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = docs.count()
    // dense permutation: positions are exactly 0..n-1, each once
    assert(got.values.toSet === (0L until n).toSet)
    // equals the single-window global sort it decomposes
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(graft.functions.TextFunctions.hash32(
        concat(lit("v:"), col("doc_id").cast("string"))).asc, col("doc_id").asc)
    val global = docs.withColumn("p", row_number().over(w).cast("long") - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === global)
    // and NOT the identity order (it is an actual shuffle)
    assert(got.exists { case (id, pos) => id != pos })
  }

  test("chunkDocs: full coverage with overlap, byte-exact rebuild, tail bounded") {
    import spark.implicits._
    val toks = (1 to 50).map(i => s"t$i")
    val docs = Seq((1L, toks.mkString(" ")), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(docs, chunkTokens = 32, overlap = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 1: 50 tokens, step 24 -> chunks at 0 and 24; chunk 1 reaches the
    // doc end, so NO chunk at 48 (it would be a strict substring of chunk 1)
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq === Seq(0L, 1L))
    assert(d1(0)._3 === toks.slice(0, 32).mkString(" ") && d1(0)._4 === 32L)
    assert(d1(1)._3 === toks.slice(24, 50).mkString(" ") && d1(1)._4 === 26L)
    // every token is covered despite the early stop
    assert(d1.flatMap(_._3.split(" ")).toSet === toks.toSet)
    // consecutive chunks overlap by `overlap` tokens
    assert(d1(0)._3.split(" ").takeRight(8).toSeq === d1(1)._3.split(" ").take(8).toSeq)
    // doc 2 fits one chunk; doc 3 (zero tokens) produces none
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "a b", 2L)))
    assert(!got.exists(_._1 == 3L))
  }

  test("bpeMerges: hand-computed merge sequence, weighted counts, early stop") {
    import spark.implicits._
    // vocab: aaab x3, ab x1
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, k = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 0: pairs (a,a)=2x3=6 beat (a,b)=3+1=4 -> merge aa
    //   (left-to-right: 'a a a b' -> 'aa a b', the fencepost residue rule)
    // round 1: (a,b)=3+1=4 beats (aa,a)=3 -> merge ab
    // round 2: (aa,ab)=3 -> merge aaab; round 3: no pairs left -> stop
    assert(got === Seq(
      (0L, "a a", "aa", 6L),
      (1L, "a b", "ab", 4L),
      (2L, "aa ab", "aaab", 3L)))
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("tfIdfTopTerms: rare terms outrank common ones; k bound and tie order hold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared shared shared unique alpha"),
      (2L, "shared other words beta"),
      (3L, "shared more words gamma")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(5)))
    assert(got.count(_._1 == 1L) === 2)
    // doc 1: 'shared' tf=3 df=3 -> 1.0; 'unique'/'alpha' tf=1 df=1 -> 1.0;
    // tie at 1.0 broken by term asc -> alpha then shared
    assert(got.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq === Seq("alpha", "shared"))
    // doc 2: 'beta' (df=1) outranks 'shared' (df=3) and 'words' (df=2)
    assert(got.filter(_._1 == 2L).sortBy(_._3).map(_._2).head === "beta")
    graft.operators.Dedup.releaseCaches(spark) // tfIdfTopTerms persists tf
  }

  test("contaminationBloom: no false negatives vs the exact join; FPs bounded") {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val exact = TextAnalysis.contaminationTable(docs, bench, n = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = TextAnalysis.contaminationBloom(docs, bench, n = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.nonEmpty) // benchmark self-matches, so never vacuous
    // Bloom guarantee: every truly-shared gram is counted
    for ((id, nShared) <- exact)
      assert(bloom(id)._2 >= nShared, s"doc $id: bf=${bloom(id)._2} < exact=$nShared")
    // docs the exact join does NOT flag: bf hits are pure false positives,
    // which at fpp=1e-6 should be (near-)zero corpus-wide
    val fpDocs = bloom.count { case (id, (_, hits)) => hits > 0 && !exact.contains(id) }
    assert(fpDocs <= math.max(1, bloom.size / 50), s"$fpDocs FP docs of ${bloom.size}")
  }

  test("upsampleByFactor: exact copy counts, epoch ids, factor-0 drops") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "source")
    val up = Sampling.upsampleByFactor(docs, col("source"),
      factors = Seq("a" -> 3, "c" -> 0), defaultFactor = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byDoc = up.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byDoc === Map(1L -> Seq(0, 1, 2), 2L -> Seq(0, 1, 2), 3L -> Seq(0)))
    assert(!byDoc.contains(4L)) // factor 0 = dropped stratum
  }

  test("tokenBudgetQuota: budget filled with one straddling doc; uncapped passes through") {
    import spark.implicits._
    // 10 docs of 10 tokens each per source (100 tokens available)
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = (for (s <- Seq("a", "b", "c"); i <- 1 to 10)
      yield (s.hashCode.toLong * 100 + i, text, s)).toDF("doc_id", "text", "source")
    val kept = Sampling.tokenBudgetQuota(docs, col("doc_id"), col("source"),
      budgets = Seq("a" -> 35L, "b" -> 1000L), defaultBudget = 0L).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // 35-token budget over 10-token docs: 3 docs before the budget line and
    // the straddling 4th kept (cumBefore 30 < 35); budget is FILLED (40 >= 35)
    assert(bySrc.getOrElse("a", 0) === 4, s"got $bySrc")
    // budget above the stratum volume: pure pass-through
    assert(bySrc.getOrElse("b", 0) === 10)
    // zero default budget: nothing kept (cumBefore 0 < 0 is false)
    assert(bySrc.getOrElse("c", 0) === 0)
    // deterministic: same kept set on a re-run over a reshuffled input
    val kept2 = Sampling.tokenBudgetQuota(docs.repartition(7), col("doc_id"),
      col("source"), budgets = Seq("a" -> 35L, "b" -> 1000L), defaultBudget = 0L)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(kept.toSet === kept2.toSet)
  }

  test("evalCarve: exact per-stratum quotas, all rows labeled, NULL keys train, growth-stable") {
    import spark.implicits._
    val rows = (1L to 60L).map(i => (i, if (i % 3 == 0) "a" else "b"))
    val docs = rows.toDF("doc_id", "lang")
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], "a"))
        .toDF("doc_id", "lang").select(col("doc_id").cast("long"), col("lang")))
    val got = Sampling.evalCarve(docs, col("doc_id"), col("lang"), nEval = 5)
      .collect().map(r => (Option(r.get(0)).map(_.toString.toLong), r.getString(2))).toList
    assert(got.size === 61) // every row labeled, none dropped
    val evalIds = got.collect { case (Some(id), "eval") => id }
    assert(evalIds.size === 10) // exactly 5 per stratum
    // NULL key rows are train and consume no quota
    assert(got.contains((None, "train")))
    // growth stability: adding rows that hash ABOVE every boundary
    // cannot relabel the existing eval set (re-run equality on a superset
    // restricted to the original ids is the practical check)
    val more = docs.unionByName((1000L to 1040L).map(i => (i, "b")).toDF("doc_id", "lang"))
    val again = Sampling.evalCarve(more, col("doc_id"), col("lang"), nEval = 5)
      .collect().collect { case r if Option(r.get(0)).exists(v => v.toString.toLong <= 60L) =>
        (r.getLong(0), r.getString(2)) }.toMap
    val base = got.collect { case (Some(id), s) if id >= 1L && id <= 60L => id -> s }.toMap
    // labels may only move at the hash boundary; count how many moved
    val moved = base.count { case (id, s) => again(id) != s }
    assert(moved <= 5, s"more than one stratum boundary shifted: $moved")
  }
}
