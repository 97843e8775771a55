package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search
import graft.tables.Tables

/** Full-text retrieval: index-served ≡ corpus-scanned results, bucket
  * pruning reaches the scan as a partition filter, conjunctive subset
  * semantics, query normalization, and the pinned phrase-count
  * semantics.
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def docs = Tables.documents(spark, SparkTestSession.sf0001)

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSeq.sortBy(_._4)

  test("searchIndexed == searchTopK, and the read prunes to the query buckets") {
    val path = SparkTestSession.scratch("search_spec") + "/idx"
    Search.writeIndex(docs, path)
    val query = Seq("spark", "vector", "dup")

    val scanned = asTuples(Search.searchTopK(docs, query, k = 10))
    val served = Search.searchIndexed(spark, path, query, k = 10)
    val servedRows = asTuples(served)
    assert(servedRows === scanned && scanned.size === 10)

    // the bucket set reached the postings scan as a partition filter:
    // at most one bucket dir per query term was read (descend through
    // the AQE wrapper — this plan has exchanges, so executedPlan is
    // AdaptiveSparkPlanExec and a flat collect sees no scans)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scansOf)
    }
    val plan = served.queryExecution.executedPlan
    val postingsScan = scansOf(plan).find(_.metadata.get("Location")
      .exists(_.contains("postings"))).getOrElse(fail(s"no postings scan in\n$plan"))
    val nParts = postingsScan.metrics.get("numPartitions")
      .orElse(postingsScan.metrics.get("numFiles")).map(_.value)
      .getOrElse(fail("no partition/file metric"))
    assert(plan.toString.contains("PartitionFilters: [bucket"), plan.toString)
    assert(nParts <= query.size.toLong,
      s"read $nParts postings partitions for a ${query.size}-term query")
  }

  test("conjunctive hits are the all-terms subset of disjunctive hits") {
    val query = Seq("spark", "join")
    val dis = Search.searchTopK(docs, query, k = 1000)
    val con = Search.searchConjunctive(docs, query, k = 1000)
    val disAll = dis.filter(col("n_terms") === 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val conIds = con.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(conIds === disAll && conIds.nonEmpty)
    assert(con.filter(col("n_terms") =!= 2).count() === 0L)
  }

  test("query normalization: tokenizer semantics, case/punct-insensitive, deduped") {
    val a = asTuples(Search.searchTopK(docs, Seq("Spark, JOIN!"), k = 5))
    val b = asTuples(Search.searchTopK(docs, Seq("spark", "join", "spark"), k = 5))
    assert(a === b && a.nonEmpty)
    assertThrows[IllegalArgumentException] {
      Search.searchTopK(docs, Seq("!!!", ""), k = 5)
    }
  }

  test("unknown terms: zero hits scanned; empty frame (same schema) served") {
    assert(Search.searchTopK(docs, Seq("zzzznotaterm"), k = 5).count() === 0L)
    val path = SparkTestSession.scratch("search_spec2") + "/idx"
    Search.writeIndex(docs.limit(50), path)
    val served = Search.searchIndexed(spark, path, Seq("zzzznotaterm"), k = 5)
    assert(served.count() === 0L)
    assert(served.columns.toSeq === Seq("doc_id", "n_terms", "score_ppb", "rank"))
  }

  test("phrase count semantics are pinned: non-overlapping, delimiter-consuming") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b a"),      // "a b a" overlaps itself -> ONE consuming match
      (2L, "x a b a y a b a"), // two disjoint occurrences
      (3L, "a, B: a"),         // tokenizer normalizes case/punct -> "a b a"
      (4L, null.asInstanceOf[String]),
      (5L, "a b")              // partial -> no hit
    ).toDF("doc_id", "text")
    val got = Search.phraseSearch(d, "A  b;a").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("bm25: length normalization and tf saturation behave like BM25") {
    import spark.implicits._
    val filler = (1 to 50).map(i => s"filler$i").mkString(" ")
    val d = Seq(
      (1L, "hit hit"),                  // short doc, tf 2
      (2L, s"hit hit $filler"),         // same tf, much longer -> lower score
      (3L, ("hit " * 40).trim),          // tf 40: saturates, NOT 20x doc1
      (4L, "other words only")
    ).toDF("doc_id", "text")
    val rows = Search.bm25TopK(d, Seq("hit"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("score")).toMap
    assert(rows(1L) > rows(2L), s"length norm failed: $rows")
    // saturation: doc3 has 20x doc1's tf but must score < 2x doc1
    // (k1=1.2 caps the tf factor at k1+1 = 2.2)
    assert(rows(3L) > rows(1L) && rows(3L) < 2L * rows(1L), s"saturation failed: $rows")
    assert(!rows.contains(4L))
    // tf factor is bounded by (k1+1) = 2.2e6 ppm times the idf weight
    val wPpb = 1000000000L / 3 // df(hit)=3
    assert(rows.values.forall(_ <= 2200000L * wPpb), s"unbounded: $rows")
  }

  test("searchMany == searchTopK per query, ranked inside each query") {
    val qs = spark.createDataFrame(Seq(
      (10L, "spark join"), (20L, "Merge; BATCH window")))
      .toDF("query_id", "query")
    val many = Search.searchMany(docs, qs, k = 7)
    for ((qid, q) <- Seq((10L, Seq("spark", "join")),
        (20L, Seq("merge", "batch", "window")))) {
      val got = many.filter(col("query_id") === qid)
        .select("doc_id", "n_terms", "score_ppb", "rank")
      val want = Search.searchTopK(docs, q, k = 7)
      assert(asTuples(got) === asTuples(want), s"query $qid diverged")
    }
    // the per-query rank<=k filter is pushed into the window as a group
    // limit (no full per-query ranking is materialized)
    val plan = many.queryExecution.optimizedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("rrfFuse: hand-checked integer RRF; absent-from-list contributes nothing") {
    import spark.implicits._
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val got = Search.rrfFuse(Seq(a, b), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 1e9 div 61 = 16393442, div 62 = 16129032
    assert(got.toSeq === Seq(
      (2L, 2L, 16393442L + 16129032L, 1L),
      (1L, 1L, 16393442L, 2L),
      (3L, 1L, 16129032L, 3L)))
  }

  test("hybridTopK == rrfFuse of its keyword and vector components") {
    val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
    val qv = emb.filter(col("vec_id") === 0L)
    val query = Seq("spark", "vector", "dup")
    val hybrid = asTuples(Search.hybridTopK(docs, emb, query, qv, k = 10, kCand = 20)
      .select("doc_id", "n_lists", "rrf_ppb", "rank"))
    val composed = asTuples(Search.rrfFuse(Seq(
      Search.searchTopK(docs, query, 20).select(col("doc_id"), col("rank")),
      graft.operators.Similarity.bruteForceTopK(emb, qv, 20)
        .select(col("vec_id").as("doc_id"), col("rk").as("rank"))), k = 10)
      .select("doc_id", "n_lists", "rrf_ppb", "rank"))
    assert(hybrid === composed && hybrid.size === 10)
  }

  test("moreLikeThis: seed excluded, hits share seed terms, profile is top-tf") {
    import spark.implicits._
    val d = Seq(
      (0L, "apple apple apple banana banana cherry zebra"),
      (1L, "apple banana pear"),   // 2 seed terms
      (2L, "cherry plum"),          // 1 seed term (cherry in profile at n=3)
      (3L, "zebra only here"),      // zebra NOT in top-3 profile
      (4L, "plum pear quince")      // no seed terms
    ).toDF("doc_id", "text")
    // profile nTerms=3: apple(3), banana(2), cherry(1) — zebra(1) loses the
    // tie to cherry on term asc
    val got = Search.moreLikeThis(d, docId = 0L, nTerms = 3, k = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_terms"))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === 2L && got(2L) === 1L)
  }

  test("mmrTopK diversifies: near-duplicate of pick 1 loses to a farther candidate") {
    import spark.implicits._
    // query [0.9, 0.436]; candidates: a=[1,0] (rel ~0.90, picked first),
    // its near-dup b (rel ~0.85, sim-to-a ~0.995), orthogonal c=[0,1]
    // (rel ~0.44, sim-to-a 0). Plain top-2 = {a, b}; MMR at λ=50 must
    // pick c second: 50·852k − 50·995k < 0 < 50·436k.
    // (The query must NOT equal a: for q == a every candidate has
    // rel == sim-to-a and λ=50 scores all collapse to zero.)
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.995, -0.0998)), (3L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val qs = Seq((100L, Seq(0.9, 0.436))).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .mmrTopK(vecs, qs, k = 2, kCand = 3, lambdaPct = 50)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1L), (3L, 2L)), got.toSeq)
    // and at λ=100 MMR degenerates to plain relevance order
    val pure = graft.operators.Similarity
      .mmrTopK(vecs, qs, k = 2, kCand = 3, lambdaPct = 100)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(pure.toSeq === Seq((1L, 1L), (2L, 2L)), pure.toSeq)
  }

  test("score is tf-weighted by linear idf: rarer term outranks commoner at equal tf") {
    import spark.implicits._
    val d = Seq(
      (1L, "rare common"),
      (2L, "common common common"), // tf 3 of the common term
      (3L, "common"),
      (4L, "common filler")
    ).toDF("doc_id", "text")
    // df(rare)=1 -> w 1e9; df(common)=4 -> w 25e7. doc1 = 1e9 + 25e7 wins
    // over doc2's 3 * 25e7 = 75e7 despite fewer matched tokens.
    val top = Search.searchTopK(d, Seq("rare", "common"), k = 2).collect()
    assert(top.head.getLong(0) === 1L)
    assert(top.head.getAs[Long]("score_ppb") === 1000000000L + 250000000L)
    assert(top(1).getLong(0) === 2L)
    assert(top(1).getAs[Long]("score_ppb") === 750000000L)
  }
}
