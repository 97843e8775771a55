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
    assert(Dedup.ngramJaccardPairs(emptyDocs).count() === 0)
    assert(Dedup.dedupSpans(emptyDocs).count() === 0)
    Dedup.releaseCaches(spark)
  }

  test("round-4 operators survive degenerate docs (too-short, empty, symbols)") {
    // every weird doc is < 3 tokens except doc 5 — jaccard drops them,
    // spans keeps a row per doc, packing packs them all
    assert(Dedup.ngramJaccardPairs(weirdDocs, n = 3, threshold = 0.5).count() === 0)
    val spans = Dedup.dedupSpans(weirdDocs, k = 4).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(spans.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(spans(1L) === "" && spans(3L) === "" && spans(5L) === "one two three four")
    val packed = graft.operators.Sampling.packSequences(weirdDocs, budget = 2, shards = 2)
    assert(packed.count() === 5)
    assert(TextAnalysis.tfIdfTopTerms(weirdDocs, k = 3).count() > 0)
    Dedup.releaseCaches(spark)
  }

  test("contaminationBloom: empty benchmark flags nothing; empty corpus returns empty") {
    val none = TextAnalysis.contaminationBloom(weirdDocs, emptyDocs, n = 2)
    assert(none.collect().forall(_.getLong(2) === 0L)) // n_bf_grams all zero
    assert(TextAnalysis.contaminationBloom(emptyDocs, weirdDocs, n = 2).count() === 0)
  }

  test("character-offset span family on empty and degenerate input") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // empty corpus: empty output, no error, in both arms and both ops
    assert(TextAnalysis.decontaminateSpans(emptyDocs, weirdDocs, n = 2, cjk = true).count() === 0)
    assert(Dedup.dedupSpans(emptyDocs, k = 4, cjk = true).count() === 0)
    Dedup.releaseCaches(spark)
    // degenerate docs (empty / whitespace / symbols / null text): the
    // offset arms keep ONE ROW PER DOC and — unlike the latin token
    // rebuild — PRESERVE non-token text ("!!!" survives as-is)
    val withNull = weirdDocs.unionByName(
      Seq((6L, null: String)).toDF("doc_id", "text"))
    val dec = TextAnalysis.decontaminateSpans(withNull, emptyDocs, n = 2, cjk = true)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    Dedup.releaseCaches(spark)
    assert(dec.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(dec.values.forall(_._2 === 0L)) // empty benchmark excises nothing
    assert(dec(3L)._1 === "!!!" && dec(6L)._1 === "" && dec(4L)._1 === "a b")
    val spans = Dedup.dedupSpans(withNull, k = 4, cjk = true)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    Dedup.releaseCaches(spark)
    assert(spans.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    // zero-token docs have zero chunks; null text lowers to ''
    assert(spans(6L) === (("", 0L)) && spans(3L)._2 === 0L)
    // the two single-chunk docs ("a b" / "one two three four") are
    // unique spans at maxOcc=1 → untouched
    assert(spans(5L)._1 === "one two three four" && spans(4L)._1 === "a b")
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

  test("round-6 operators on empty and degenerate input") {
    import spark.implicits._
    val S = graft.operators.Sampling
    assert(S.temperatureQuota(emptyDocs, col("doc_id"), col("text")).count() === 0)
    assert(S.sampleFixed(emptyDocs, col("doc_id"), 5).count() === 0)
    assert(TextAnalysis.bpeMerges(emptyDocs, k = 3).count() === 0)
    // single-char vocab: no adjacent pairs, zero merges (early stop)
    val single = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMerges(single, k = 3).count() === 0)
    // NULL stratum forms its own quota group instead of vanishing
    val nullStrata = Seq((1L, Some("x")), (2L, None), (3L, None))
      .toDF("doc_id", "src")
    val kept = S.temperatureQuota(nullStrata, col("doc_id"), col("src"),
        alpha = 1.0, scale = 1.0)
      .count()
    assert(kept === 3L)
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("round-5 operators on empty and degenerate input") {
    import spark.implicits._
    val S = graft.operators.Sampling
    // empty frames: no rows, no error (shuffleRank must survive an empty
    // range partitioner + empty offsets table)
    assert(S.capPerStratum(emptyDocs, col("doc_id"), col("text"), 3).count() === 0)
    assert(S.shuffleRank(emptyDocs, col("doc_id")).count() === 0)
    assert(S.packSequencesScalable(emptyDocs, budget = 16).count() === 0)
    assert(TextAnalysis.chunkDocs(emptyDocs).count() === 0)
    assert(TextAnalysis.vocabulary(emptyDocs).count() === 0)
    // vocabulary ranks deterministically on a tiny frame incl. ties
    import spark.implicits._
    val tiny = Seq((1L, "b b a a"), (2L, "a c")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(tiny, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a: 3 occurrences in 2 docs; b: 2 in 1 (c cut at k=2)
    assert(vocab.toSeq === Seq(("a", 3L, 2L, 1L), ("b", 2L, 1L, 2L)))
    // degenerate docs: chunking drops only the zero-token rows
    val chunks = TextAnalysis.chunkDocs(weirdDocs, chunkTokens = 2, overlap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(chunks.map(_._1).toSet === Set(4L, 5L)) // docs with >= 1 token
    assert(chunks.count(_._1 == 5L) === 2) // 4 tokens / 2-token chunks
    // NULL stratum is its own quota bucket, not dropped
    val nullStrata = Seq((1L, Option.empty[String]), (2L, None), (3L, Some("s")))
      .toDF("doc_id", "src")
    val capped = S.capPerStratum(nullStrata, col("doc_id"), col("src"), 1)
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(capped.length === 2 && capped.count(_._2.isEmpty) === 1)
    // shuffleRank on a single row: position 0
    val one = Seq((7L, "x")).toDF("doc_id", "text")
    assert(S.shuffleRank(one, col("doc_id")).select("shuffle_pos")
      .first().getLong(0) === 0L)
    // NULL doc_id: scalable packing must retain the row (its own NULL
    // shard group), matching the window form — not NPE or drop it
    val withNull = Seq((Some(1L), "a b c"), (None, "x y"), (Some(2L), "d e"))
      .toDF("doc_id", "text")
    assert(S.packSequencesScalable(withNull, budget = 4, shards = 2).count() === 3)
    assert(S.packSequences(withNull, budget = 4, shards = 2).count() === 3)
    // empty corpus: ANN training returns empty frames, not an error (the
    // behavior of the pre-map-side join forms)
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Ivf.train(emptyEmb, 4).count() === 0)
    assert(graft.operators.Ivf.index(emptyEmb, graft.operators.Ivf.train(emptyEmb, 4))
      .count() === 0)
    assert(graft.operators.Ivf.trainScalable(emptyEmb, 4).count() === 0)
    assert(graft.operators.Pq.train(emptyEmb, dim = 8, m = 2, ksub = 2).count() === 0)
    // residual path on an empty corpus: empty index + empty centroids ->
    // empty codebook/codes/result, not an error
    val eIdx = graft.operators.Ivf.index(emptyEmb, graft.operators.Ivf.train(emptyEmb, 4))
    val eCents = graft.operators.Ivf.train(emptyEmb, 4)
    val eCb = graft.operators.Pq.trainResidual(eIdx, eCents, dim = 8, m = 2, ksub = 2)
    assert(eCb.count() === 0)
    assert(graft.operators.Pq.encodeResidual(eIdx, eCents, eCb, dim = 8, m = 2)
      .count() === 0)
    assert(graft.operators.Pq.ivfPqResidualTopK(eIdx, eCents,
      graft.operators.Pq.encodeResidual(eIdx, eCents, eCb, dim = 8, m = 2),
      eCb, emptyEmb, emptyEmb, dim = 8, k = 3, nprobe = 2, m = 2).count() === 0)
    graft.operators.Dedup.releaseCaches(spark)
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

  test("as-of join: NULL right ts and NULL keys never leak payloads") {
    import spark.implicits._
    // a NULL-ts right row would sort FIRST and hand its payload to every
    // unmatched left row; a NULL-key right row would pair with NULL-key
    // left rows though an equi-join never matches NULL
    val left = Seq((Some(1L), 25L), (Some(2L), 25L), (None, 25L))
      .toDF("k", "lts")
    val right = Seq(
      (Some(1L), Some(10L), 5.0),             // genuine match for k=1
      (Some(2L), None: Option[Long], 99.0),   // NULL ts: no as-of position
      (None: Option[Long], Some(1L), 77.0))   // NULL key: never matches
      .toDF("k", "rts", "p")
    val got = graft.operators.AsOfJoin.asOf(left, "lts", right, "rts", "k", "p")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set((Some(1L), Some(5.0)), (Some(2L), None), (None, None)))
  }

  test("audit edge cases: empty child passes FK audit; empty table profiles as n=0") {
    import spark.implicits._
    val parent = Seq(1L).toDF("pk")
    val r = graft.operators.Audit.referentialIntegrity(
      Seq.empty[Long].toDF("fk"), col("fk"), parent, col("pk")).collect().head
    assert(r.toSeq === Seq(0L, 0L, 0L, 0L, 0L, true)) // nothing can dangle
    val prof = graft.operators.Audit.columnProfile(
        Seq.empty[(Long, String)].toDF("a", "b"), Seq("a", "b"))
      .collect().map(r2 => r2.getString(0) -> (r2.getLong(1), r2.getLong(2))).toMap
    assert(prof === Map("a" -> ((0L, 0L)), "b" -> ((0L, 0L)))) // present, not vanished
  }

  test("similarity on empty query set returns empty") {
    import spark.implicits._
    val emb = graft.tables.Tables.embeddings(spark, SparkTestSession.sf0001)
    val emptyQ = emb.filter(col("vec_id") < 0)
    assert(Similarity.bruteForceTopK(emb, emptyQ, 5).count() === 0)
    assert(Similarity.lshTopKMultiProbe(emb, emptyQ, 64, 5).count() === 0)
  }

  test("winnowing on degenerate docs: short docs drop, empty corpus is empty") {
    // < k+w-1 = 6 tokens -> no full window -> no fingerprint row
    assert(Dedup.winnowTable(weirdDocs).count() === 0)
    assert(Dedup.winnowPairs(weirdDocs).count() === 0)
    assert(Dedup.winnowTable(emptyDocs).count() === 0)
    assert(Dedup.winnowPairs(emptyDocs).count() === 0)
    Dedup.releaseCaches(spark)
  }

  test("bucketed embedding pairs on empty/singleton input return empty") {
    import spark.implicits._
    val emb = graft.tables.Tables.embeddings(spark, SparkTestSession.sf0001)
    val empty = emb.filter(col("vec_id") < 0)
    assert(Similarity.cosineNearDupPairsBucketed(empty, 0.45, 64).count() === 0)
    val one = emb.filter(col("vec_id") === 0)
    assert(Similarity.cosineNearDupPairsBucketed(one, 0.45, 64).count() === 0)
  }

  test("contrastiveMine: single-label corpus yields positives only; empty queries yield nothing") {
    import spark.implicits._
    val vecs = Seq(
      (0L, 1L, Seq(1.0f, 0.0f)), (1L, 1L, Seq(0.9f, 0.1f)), (2L, 1L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val mined = Similarity.contrastiveMine(vecs, vecs.filter(col("vec_id") === 0L),
      kPos = 2, kNeg = 2).collect()
    assert(mined.forall(_.getAs[String]("role") == "pos"),
      "no other-label vectors exist, so no negatives can be mined")
    assert(mined.length === 2)
    assert(Similarity.contrastiveMine(vecs, vecs.filter(col("vec_id") < 0L))
      .count() === 0L)
  }

  test("membership point read: no sidecar -> on-the-fly index, same rows") {
    import spark.implicits._
    val path = SparkTestSession.scratch("edge_member") + "/t"
    val rows = (0 until 64).map(i => (i * 131L % 977, 1000L + i % 8, 500L + i / 8))
    graft.operators.Layout.writeClustered(
      rows.toDF("id", "x", "y"), Seq("x", "y"), path, bits = 4, bucketBits = 3)
    // no writeMembership: the lookup must fall back to an on-the-fly index
    val probe = rows(17)._1
    val got = graft.operators.Layout.prunedPointRead(spark, path, "id", probe)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(got === Seq(probe))
  }

  test("bpeEncode: null-text doc encodes empty through the native expression") {
    import spark.implicits._
    val docs = Seq((0L, Option("ab ab")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(docs, Seq("a b" -> "ab"))
      .orderBy("doc_id").collect()
    assert(got(0).getAs[String]("encoded") === "ab | ab")
    assert(got(1).getAs[String]("encoded") === "" &&
      got(1).getAs[Long]("n_words") === 0L && got(1).getAs[Long]("n_subwords") === 0L)
  }

  test("K6 route with a source type absent from events creates an empty table") {
    import graft.operators.ConfigRouter
    import graft.operators.ConfigRouter.TableProcess
    val events = graft.tables.Tables.events(spark, SparkTestSession.sf0001)
    val routes = Seq(
      TableProcess("purchase", "edge_trade", "event_id,user_id"),
      TableProcess("no_such_type", "edge_ghost", "event_id"))
    val summary = ConfigRouter
      .materializeRoutes(spark, events, routes, dbName = "graft_k6_edge")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary("edge_ghost") === 0L) // DDL ran; no rows routed
    assert(summary("edge_trade") > 0L)
    assert(spark.catalog.tableExists("graft_k6_edge.edge_ghost"))
  }
}
