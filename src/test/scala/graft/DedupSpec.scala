package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.tables.Tables

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  /** Ground truth: brute-force all-pairs Jaccard over shingle STRING sets
    * (built here from the raw tokenizer — shingleSets itself now emits
    * only the fused hashes, so this stays an independent witness). */
  private lazy val bruteforcePairs: Set[(Long, Long)] = {
    import graft.functions.TextFunctions
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_distinct(TextFunctions.wordShingles(col("toks"), 3)).as("shingles"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("j", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("j") >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("exact dedup groups cover every document exactly once") {
    val docs = Tables.documents(spark, dir)
    val groups = Dedup.exactGroups(docs)
    assert(groups.agg(sum("ct")).collect()(0).getLong(0) === docs.count())
  }

  test("keepBest: a NULL preference (unranked source) loses to every ranked copy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text", Some(5L)),  // ranked, worst rank
      (2L, "same text", None),      // unranked (priority-table join miss)
      (3L, "same text", Some(1L)))  // curated copy — must win
      .toDF("doc_id", "text", "pref")
    val keep = graft.operators.Dedup.exactGroupsKeepBest(docs, col("pref"))
      .collect().head.getAs[Long]("keep_id")
    assert(keep === 3L)
    // all-NULL group still picks deterministically by doc_id
    val allNull = Seq((7L, "t", None: Option[Long]), (4L, "t", None))
      .toDF("doc_id", "text", "pref")
    assert(graft.operators.Dedup.exactGroupsKeepBest(allNull, col("pref"))
      .collect().head.getAs[Long]("keep_id") === 4L)
  }

  test("bandsFromShingles rejects a signature count not divisible by the band width") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.minhashLshPairs(docs, numSigs = 10, rowsPerBand = 4)
    }
    assert(e.getMessage.contains("multiple of rowsPerBand"))
  }

  test("minhash LSH finds all J>=0.8 pairs (recall vs brute force)") {
    val lsh = Dedup.minhashLshPairs(Tables.documents(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // with 4 bands x 2 rows, P(miss | J>=0.8) < 1% — the planted
    // near-dups are J>=0.9 where P(miss) < 0.2%
    assert(bruteforcePairs.nonEmpty, "testdata should contain near-dup pairs")
    assert(lsh === bruteforcePairs,
      s"missed=${bruteforcePairs -- lsh} extra=${lsh -- bruteforcePairs}")
  }

  test("hot-bucket cap suppresses mega-bucket candidate blowup") {
    import spark.implicits._
    // 40 docs sharing one boilerplate shingle-set: every band is one
    // mega-bucket of 40
    val boiler = (1L to 40L).map(i => (i, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(boiler, maxBucket = 1000)
    assert(uncapped.count() === 40L * 39 / 2)
    val capped = Dedup.minhashLshPairs(boiler, maxBucket = 10)
    assert(capped.count() === 0)
  }

  test("salted triangle join over hot buckets is pair-identical to uncapped") {
    val docs = Tables.documents(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // maxBucket=1 sends EVERY multi-doc bucket through the salt path
    val salted = pairs(Dedup.minhashLshPairs(docs, maxBucket = 1, saltChunk = 2))
    val uncapped = pairs(Dedup.minhashLshPairs(docs, maxBucket = Int.MaxValue))
    assert(salted === uncapped && salted.nonEmpty)
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 token run share a fingerprint") {
    import spark.implicits._
    // k=3, w=4: any shared run of >= 6 tokens must yield a common window-min
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"unrelated prefix one two three $shared"),
      (2L, s"$shared completely different suffix here now"),
      (3L, "nothing in common with the others at all today"))
      .toDF("doc_id", "text")
    val fps = graft.operators.Dedup.winnowTable(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    // and the pair generator surfaces exactly the (1,2) candidate
    val pairs = graft.operators.Dedup.winnowPairs(docs, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowPairs explodes from a materialized fingerprint table (perf pin)") {
    // Generate over the raw winnow chain re-evaluates tokenize+hash+window
    // per output row (measured 254s vs ~4s at sf0.001) — the cache boundary
    // below the explode is load-bearing; this pins the plan shape.
    val docs = graft.tables.Tables.documents(spark, dir)
    val plan = graft.operators.Dedup.winnowPairs(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), s"no cache boundary in:\n$plan")
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("duplicateClusters: transitive chain collapses to one min-labeled cluster") {
    import spark.implicits._
    // a~b, b~c, c~d but a!~c etc. — a path graph; components must close
    // transitively to min label 1, plus a separate pair (10, 11)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("starCC: a 1000-link chain converges in O(log n) rounds, labels exact") {
    import spark.implicits._
    // worst case for label propagation (999 rounds = component diameter);
    // the two-phase star contraction must close it in ~log2(1000) rounds
    val n = 1000
    val pairs = (0L until n.toLong - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = graft.operators.Dedup.starCC(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === n)
    assert(got.forall(_._2 == 0L), s"all $n chain nodes must label to the min (0)")
    assert(rounds <= 20,
      s"star contraction took $rounds rounds on a $n-chain — not O(log n)")
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("starCC: shuffled high-id chain and disjoint cliques stay exact") {
    import spark.implicits._
    // ids NOT in path order (the min sits mid-chain) + two 4-cliques
    val chain = (0 until 60).map(i => (1000L + ((i * 37) % 61), 1000L + (((i + 1) * 37) % 61)))
    val cliq = for (b <- Seq(1L, 100L); x <- 0 to 3; y <- (x + 1) to 3)
      yield (b + x, b + y)
    val pairs = (chain ++ cliq).toDF("doc_a", "doc_b")
    val (labels, rounds) = graft.operators.Dedup.starCC(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 61).forall(i => got(1000L + i) == 1000L), "chain labels to min id")
    assert((0 to 3).forall(i => got(1L + i) == 1L && got(100L + i) == 100L))
    assert(rounds <= 12, s"took $rounds rounds")
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("mergeClusters: a new pair bridges two stored clusters; bystanders survive") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L), (20L, 20L))
      .toDF("doc_id", "cluster")
    val newPairs = Seq((2L, 11L)).toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.mergeClusters(labels, newPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // clusters {1,2} and {10,11} merge to root 1; singleton 20 (a
    // self-edge in the star encoding) is untouched by the fold
    assert(got === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 20L -> 20L))
    graft.operators.Dedup.releaseCaches(spark)
  }

  /** Brute-force all-pairs Jaccard over hash sets at an arbitrary threshold
    * (ngramJaccardPairs ground truth — same distinct-hash contract). */
  private def bruteJaccard(docs: org.apache.spark.sql.DataFrame, t: Double): Set[(Long, Long)] = {
    val sh = Dedup.shingleSets(docs)
    val a = sh.select(col("doc_id").as("doc_a"), col("hashes").as("h_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("hashes").as("h_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("j", size(array_intersect(col("h_a"), col("h_b"))).cast("double") /
        size(array_union(col("h_a"), col("h_b"))))
      .filter(col("j") >= t)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("ngramJaccardPairs (prefix filtering) is pair-identical to brute force") {
    val docs = Tables.documents(spark, dir)
    val brute = bruteJaccard(docs, 0.7)
    val got = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "testdata should contain J>=0.7 pairs")
    assert(got === brute, s"missed=${brute -- got} extra=${got -- brute}")
    Dedup.releaseCaches(spark)
  }

  test("ngramJaccardPairs stays exact on a boilerplate-heavy (worst-skew) corpus") {
    import spark.implicits._
    // 30 identical docs (one mega-frequency gram set) + a near-dup + an
    // unrelated doc: frequency-ordered prefixes must still surface every
    // qualifying pair, including all C(30,2) identical ones
    val docs = ((1L to 30L).map(i => (i, "alpha beta gamma delta epsilon zeta")) ++ Seq(
      (100L, "alpha beta gamma delta epsilon eta"),
      (101L, "totally different words over here now")))
      .toSeq.toDF("doc_id", "text")
    val brute = bruteJaccard(docs, 0.5)
    val got = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute && got.size >= 30 * 29 / 2)
    Dedup.releaseCaches(spark)
  }

  test("ngramJaccardPairs keeps a pair at EXACTLY J = threshold when t/(1+t) rounds up") {
    import spark.implicits._
    // A's 28 tokens ⊂ B's 35 → J = 28/35 = 0.8 exactly. fl(0.8/1.8) and
    // fl(0.8)·35 both round UP, so without the 1e-9 slack the length and
    // positional filters each drop this true pair (found in review; the
    // other spec thresholds 0.5/0.7/1.0 all round down and cannot fire it)
    val shared = (1 to 28).map(i => f"s$i%02d")
    val unique = (1 to 7).map(i => s"u$i")
    val docs = Seq(
      (1L, shared.mkString(" ")),
      (2L, (shared ++ unique).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, n = 1, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 0.8)))
    Dedup.releaseCaches(spark)
  }

  test("dedupSpans: corpus-repeated spans deleted everywhere, order preserved, empties kept") {
    import spark.implicits._
    val boiler = "one two three four" // shared 4-token span, chunk-aligned in both carriers
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, "solo text with unique words here now"), // 7 toks -> 2 spans, both unique
      (4L, boiler), // only the banned span -> rebuilt empty
      (5L, "")) // zero tokens -> zero spans
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.dedupSpans(docs, k = 4, maxOcc = 1).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("alpha beta gamma delta", 2L, 1L)))
    assert(got(2L) === (("epsilon zeta eta theta", 2L, 1L)))
    assert(got(3L) === (("solo text with unique words here now", 2L, 2L)))
    assert(got(4L) === (("", 1L, 0L)))
    assert(got(5L) === (("", 0L, 0L)))
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("dedupSpans cjk: character-offset chunk excision; kept neighbors never clipped") {
    import spark.implicits._
    // lower("AB 机器学习真好 cd"): a(0) b(1) _(2) 机(3) 器(4) 学(5) 习(6)
    // 真(7) 好(8) _(9) c(10) d(11); toks: ab 机器 器学 学习 习真 真好 cd.
    // k=3 chunks: c0 "ab 机器 器学" [0,5), c1 "学习 习真 真好" [5,10),
    // c2 "cd" [10,12). Docs 1/2 share ONLY c1 → banned → excise [5,10):
    // the boundary ideograph 学 (char 5) is inside c1's extent, so the
    // kept c0 keeps its own chars [0,5) untouched — no neighbor clipping.
    val docs = Seq(
      (1L, "AB 机器学习真好 cd"),
      (2L, "XY 机器学习真好 zz"),
      (3L, "Hello world")) // one unique latin chunk → untouched (lowered)
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.dedupSpans(docs, k = 3, maxOcc = 1, cjk = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("ab 机器cd", 3L, 2L)), s"got: $got")
    assert(got(2L) === (("xy 机器zz", 3L, 2L)), s"got: $got")
    assert(got(3L) === (("hello world", 1L, 1L)), s"got: $got")
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("simhashTable (explode+groupBy) == simhash32 (column expression)") {
    val docs = Tables.documents(spark, dir)
    val viaTable = Dedup.simhashTable(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = docs.select(col("doc_id"),
      graft.functions.TextFunctions.simhash32(
        graft.functions.TextFunctions.tokenSet(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaTable === viaExpr)
  }

  test("simhash: near-dup pairs are close in Hamming distance") {
    val sims = Dedup.simhashTable(Tables.documents(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dists = bruteforcePairs.toSeq.map { case (a, b) =>
      java.lang.Long.bitCount(sims(a) ^ sims(b))
    }
    assert(dists.nonEmpty && dists.forall(_ <= 8),
      s"near-dup simhash distances: $dists")
  }

  test("dedupAgainst: exact/near hits vs a read-only reference; within-docs dups untouched") {
    import spark.implicits._
    val longText = (1 to 30).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again today",
      2L -> "the quick brown fox jumps over the lazy dog again today", // within-docs dup of 1
      3L -> "entirely different content with unrelated corpus vocabulary here",
      4L -> longText).toDF("doc_id", "text")
    val ref = Seq(
      100L -> "the quick brown fox jumps over the lazy dog again today", // exact hit for 1 AND 2
      101L -> (longText + " tail")).toDF("doc_id", "text") // near hit for 4
    val got = Dedup.dedupAgainst(docs, ref).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Dedup.releaseCaches(spark)
    // BOTH within-docs duplicates label exact_ref (the operator answers
    // "already in the corpus?" per doc — it never dedups docs against
    // each other); the near-dup clears 0.8 Jaccard via a band collision;
    // the unrelated doc survives
    assert(got === Map(1L -> "exact_ref", 2L -> "exact_ref",
      3L -> "kept", 4L -> "near_ref"))
    // empty reference keeps everything
    val none = Dedup.dedupAgainst(docs,
      Seq.empty[(Long, String)].toDF("doc_id", "text")).collect()
      .map(_.getString(1)).toSet
    Dedup.releaseCaches(spark)
    assert(none === Set("kept"))
  }

  test("editDistancePairs: recall-lossless vs brute force across short/long/cross pairs") {
    import spark.implicits._
    // deterministic corpus over a 4-letter alphabet: lengths straddle the
    // long threshold q*(d+1)=9, including true shorts ("abcd"/"axcd" share
    // ZERO 3-grams at ed 1 — the case the tile path exists for), empty and
    // NULL strings, identical strings, and cross short×long border pairs
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (1 to n).map(_ => "abcd"(rnd.nextInt(4))).mkString
    val organic = (1L to 80L).map(i => i -> randStr(3 + rnd.nextInt(12)))
    val planted = Seq(
      200L -> "abcd", 201L -> "axcd",            // ed 1, zero shared grams
      202L -> "", 203L -> null,                   // empty + NULL (compared as '')
      204L -> "aaabbbccc", 205L -> "aaabbbcc",    // cross: long(9) x short(8), ed 1
      206L -> "aaabbbccc", 207L -> "aaabbbcccddd" // identical + ed-3 (excluded)
    )
    val docs = (organic ++ planted).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, maxDist = 2, q = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    Dedup.releaseCaches(spark)
    val all = (organic ++ planted).map { case (i, s) => i -> Option(s).getOrElse("") }
    val brute = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      d = levenshteinRef(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(brute.exists(_._3 == 0) && brute.exists(_._3 == 1) && brute.exists(_._3 == 2),
      s"witness corpus must exercise every dist: ${brute.map(_._3)}")
    assert(got === brute, s"missed=${brute -- got} extra=${got -- brute}")
    assert(got.contains((200L, 201L, 1)) && got.contains((204L, 205L, 1)) &&
      got.contains((202L, 203L, 0)) && got.contains((204L, 206L, 0)))
  }

  test("editDistancePairs: degenerate hot short tile fails loudly, not silently") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => i -> "abc").toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.editDistancePairs(docs, maxDist = 1, q = 3, maxShortBucket = 10).collect()
    }
    Dedup.releaseCaches(spark)
    assert(e.getMessage != null && e.getMessage.contains("editDistancePairs"),
      s"expected the loud tile-cap error, got: ${e.getMessage}")
  }

  test("ngramContainmentPairs: catches the superset pair Jaccard misses; direction and threshold") {
    import spark.implicits._
    val a = "one two three four five six seven eight nine ten eleven twelve"
    val b = a + " plus many extra trailing words that roughly double the doc length overall today"
    val docs = Seq(1L -> a, 2L -> b, 3L -> "totally different content about other things entirely")
      .toDF("doc_id", "text")
    // Jaccard at 0.7 misses the (1,2) superset pair...
    val jac = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.releaseCaches(spark)
    assert(!jac.contains((1L, 2L)), s"fixture broken: Jaccard caught it: $jac")
    // ...containment at 0.8 catches it, contained side first, value 1.0
    val got = Dedup.ngramContainmentPairs(docs, n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Dedup.releaseCaches(spark)
    assert(got.keySet === Set((1L, 2L))) // doc 3 shares nothing
    assert(got((1L, 2L)) === 1.0) // every shingle of A is in B
  }

  test("corpusDiff: all four statuses; null-safe fp compare; whitespace-only edits are unchanged") {
    import spark.implicits._
    val old = Seq(
      (1L, "same text"), (2L, "will change"), (3L, "goes away"),
      (4L, null.asInstanceOf[String]), (5L, "Spaced   Out"))
      .toDF("doc_id", "text")
    val next = Seq(
      (1L, "same text"), (2L, "has changed"),
      (4L, null.asInstanceOf[String]), // null -> null: unchanged, not changed
      (5L, "spaced out"), // normalization: case/whitespace-only edit is unchanged
      (6L, "brand new"))
      .toDF("doc_id", "text")
    val got = Dedup.corpusDiff(old, next).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "unchanged", 6L -> "added"))
  }

  test("sourceOverlap: identical sources match 16/16; duplicates don't move a union signature") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    val docs = Seq(
      (1L, a, "s1"), (2L, b, "s1"),
      (3L, a, "s2"), (4L, b, "s2"), // s2 == s1 content-wise
      (5L, b, "s3")) // s3 shares only b
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("s1", "s2")) === ((16L, 1.0))) // same union set -> all positions match
    assert(got(("s1", "s3"))._1 < 16L) // strict subset differs somewhere
    assert(got(("s2", "s3")) === got(("s1", "s3"))) // s1 == s2 => same vs s3
    // duplicating a doc inside a source is a union no-op
    val withDup = docs.unionByName(Seq((6L, a, "s1")).toDF("doc_id", "text", "source"))
    val got2 = Dedup.sourceOverlap(withDup)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got2 === got)
  }

  /** Independent witness: textbook DP levenshtein. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
