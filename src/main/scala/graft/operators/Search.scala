package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokensFused

/** Full-text retrieval over the `documents` table: an inverted index in
  * relational form (term → doc postings with term frequency), scored
  * top-k search (disjunctive and conjunctive), phrase search, and a
  * persisted term-bucketed index whose reads prune to the query's
  * buckets only.
  *
  * Completes the keyword surface next to the reference's keyword split +
  * count path (gmall-realtime-self/.../app/dws/
  * DwsTrafficSourceKeywordPageViewWindow.java:63-78 tokenizes search
  * keywords and aggregates counts); this is the query-time half a
  * warehouse needs once keyword postings exist. Tokenizer semantics are
  * the pinned kernel in [[graft.functions.TextFunctions.tokens]].
  *
  * Scoring is the division-free engine-parity surrogate used across the
  * text operators: each matched term contributes
  * `tf * (10^9 div df)` and a document's score is the sum — i.e.
  * tf·idf with a LINEAR inverse-document-frequency weight in
  * parts-per-billion. Because the corpus size N multiplies every
  * term's weight equally in tf·(N/df), dropping N changes no ranking,
  * bounds the per-term weight at 10^9 (df ≥ 1), and makes the score
  * servable from the index alone (no corpus-size scalar to maintain).
  * Σ tf·w overflows BIGINT only past ~9.2e9 matched tokens in ONE
  * document; intermediates run in DECIMAL(38,0)/HUGEINT and the final
  * BIGINT cast is ANSI-checked on both engines — loud, never a wrap.
  *
  * Scale: the corpus is tokenized in ONE scan with the query-term
  * filter applied MAP-SIDE (only matching tokens ever shuffle); `tf` is
  * one (doc, term)-keyed partial agg; `df` aggregates the tf table
  * (≤ |query| rows) and broadcasts back; the final top-k is
  * TakeOrderedAndProject (per-partition heaps + driver merge of k rows,
  * no global sort). The persisted index prunes reads to the query
  * terms' hash buckets — query cost is postings-of-query-terms, not
  * corpus size.
  */
object Search {

  /** The inverted index in relational form: one row per (term, doc_id)
    * with the in-document term frequency. One tokenize+explode scan,
    * one (term, doc)-keyed partial agg. */
  def postings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(tokensFused(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Term-level index statistics: document frequency and total
    * occurrences per term. Aggregates the postings table (one row per
    * distinct (term, doc) — never the raw token stream). */
  def termStats(docs: DataFrame): DataFrame =
    statsOf(postings(docs))

  private def statsOf(post: DataFrame): DataFrame =
    post.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).cast("long").as("total_tf"))

  /** Pinned query normalization: the document tokenizer applied to the
    * query string (so a query can never ask for a term the index cannot
    * contain), deduplicated, order preserved. */
  private[graft] def queryTerms(query: Seq[String]): Seq[String] = {
    // Locale.ROOT: the document side lowercases via the tokenizer
    // kernel's Locale.ROOT lowering (tokenize_array / lower_root); a
    // default-locale toLowerCase turns "INFO" into "ınfo" on a tr-TR
    // JVM and the query misses the index
    val norm = query
      .flatMap(q => Option(q).toSeq)
      .flatMap(_.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").toSeq)
      .filter(_.nonEmpty)
    require(norm.nonEmpty, "search query normalized to zero terms")
    norm.distinct
  }

  /** Per-term linear-idf weight in ppb: `10^9 div df` (BIGINT-exact on
    * both engines; df ≥ 1 so the weight is bounded by 10^9). */
  private def withWeight(dfreq: DataFrame): DataFrame =
    dfreq.withColumn("w_ppb", expr("CAST(1000000000 AS BIGINT) div df"))

  /** Score candidate postings and take the global top-k.
    * `tf` must hold exactly the query terms' postings. Ties break by
    * doc_id ascending, so the k-cut is a deterministic SET. */
  private[graft] def scoreTopK(tf: DataFrame, dfreq: DataFrame, k: Int,
      requireAllOf: Int = 0): DataFrame = {
    val contrib =
      (col("tf").cast("decimal(38,0)") * col("w_ppb").cast("decimal(38,0)"))
    val scored = tf
      .join(broadcast(withWeight(dfreq)), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(contrib).cast("long").as("score_ppb"))
    val hits =
      if (requireAllOf > 0) scored.filter(col("n_terms") === requireAllOf)
      else scored
    Ranks.topN(hits, Seq(col("score_ppb").desc, col("doc_id").asc), k)
      .select(col("doc_id"), col("n_terms"), col("score_ppb"), col("rank"))
  }

  /** Candidate postings for a query: a LOSSLESS substring prefilter
    * skips the tokenize+explode for non-matching docs entirely (every
    * token is a maximal alnum run of the Locale.ROOT-lowered text, so
    * token == t implies lower_root(text) contains t — query terms are
    * already normalized by queryTerms; a NULL text has no tokens and is
    * dropped either way). The prefilter MUST lower with the tokenizer's
    * OWN kernel (the native lower_root expression): Spark's `lower()`
    * routes non-ASCII strings through the JVM default locale, and on a
    * tr/az JVM 'INFO' in mixed-script text lowercases to 'ınfo' — the
    * prefilter would silently drop a true hit the tokenizer still emits.
    * On a corpus scan the tokenizer IS the cost: the prefilter turns
    * "tokenize 100 TB" into "tokenize the docs that can match".
    * Surviving docs tokenize with the term filter applied map-side
    * (non-matching tokens never shuffle), then one (doc, term) partial
    * agg. */
  private def queryTf(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs
      .filter(terms.map(t =>
        call_function("lower_root", col("text")).contains(lit(t))).reduce(_ || _))
      .select(col("doc_id"), explode(tokensFused(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Disjunctive (OR) scored retrieval: top-k documents by summed
    * tf·linear-idf over the matched query terms. Output:
    * (doc_id, n_terms matched, score_ppb, rank 1..k). */
  def searchTopK(docs: DataFrame, query: Seq[String], k: Int = 10): DataFrame = {
    val terms = queryTerms(query)
    val tf = Dedup.track(queryTf(docs, terms).persist())
    scoreTopK(tf, tf.groupBy(col("term")).agg(count(lit(1)).as("df")), k)
  }

  /** Conjunctive (AND) scored retrieval: only documents containing
    * EVERY query term, ranked by the same score. */
  def searchConjunctive(docs: DataFrame, query: Seq[String], k: Int = 10): DataFrame = {
    val terms = queryTerms(query)
    val tf = Dedup.track(queryTf(docs, terms).persist())
    scoreTopK(tf, tf.groupBy(col("term")).agg(count(lit(1)).as("df")), k,
      requireAllOf = terms.size)
  }

  /** Phrase search over the normalized token stream. Semantics are
    * PINNED for engine parity: occurrences are counted on the
    * single-space-joined token string with ' ' sentinels, matches are
    * non-overlapping and consume their delimiters (so "a b a b a"
    * counts ONE "a b a", not two) — the same replace-length formula
    * runs on both engines. Map-side only; no shuffle. Returns
    * (doc_id, n_hits ≥ 1). */
  def phraseSearch(docs: DataFrame, phrase: String): DataFrame = {
    val needle = " " + queryTermsOrdered(phrase).mkString(" ") + " "
    val joined = concat(lit(" "),
      array_join(tokensFused(col("text")), " "), lit(" "))
    docs
      .withColumn("__s", joined)
      .withColumn("n_hits",
        expr(s"(length(__s) - length(replace(__s, '$needle', ''))) div ${needle.length}")
          .cast("long"))
      .filter(col("n_hits") >= 1)
      .select(col("doc_id"), col("n_hits"))
  }

  /** Phrase normalization: tokenizer semantics, duplicates KEPT and
    * order KEPT (a phrase is a sequence, not a set). */
  private def queryTermsOrdered(phrase: String): Seq[String] = {
    val norm = Option(phrase).toSeq // Locale.ROOT: see queryTerms
      .flatMap(_.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").toSeq)
      .filter(_.nonEmpty)
    require(norm.nonEmpty, "phrase normalized to zero terms")
    norm
  }

  /** BM25-shaped scored retrieval (Robertson/Spärck Jones, k1=1.2,
    * b=0.75) with the two properties that distinguish BM25 from plain
    * tf·idf kept EXACT, and the one engine-hostile part substituted:
    *
    *  - tf SATURATION and LENGTH NORMALIZATION are computed exactly as
    *    the rational  tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)). With
    *    k1=6/5, b=3/4 and avgdl = T/N (T total tokens, N docs), the
    *    term is  44·T·tf / (20·T·tf + 6·T + 18·dl·N) — integer
    *    numerator/denominator, emitted in ppm via exact integral
    *    division (DECIMAL/HUGEINT intermediates; `div` truncates and
    *    all operands are positive, so Spark and DuckDB agree exactly).
    *  - the log-idf factor is the same pinned linear-idf ppb weight as
    *    [[searchTopK]] (10^9 div df) — log's last-ulp behavior differs
    *    across libm builds and would hang the hash gate; the weight is
    *    monotone in df, which is what the ranking consumes.
    *
    * Per-term contribution is bounded by 2.2e6·1e9 ≈ 2.2e15, so the
    * BIGINT score is safe to ~4000 matched query terms per doc; the
    * final cast is ANSI-checked on both engines — loud, never a wrap.
    *
    * Scale: dl rides along the SAME tokenize scan that extracts the
    * candidate postings (size() before the explode — no second pass);
    * (N, T) is one map-side-partial scalar agg broadcast via
    * crossJoin; everything downstream is the searchTopK plan. */
  def bm25TopK(docs: DataFrame, query: Seq[String], k: Int = 10): DataFrame = {
    val terms = queryTerms(query)
    val toks = docs.select(col("doc_id"),
      tokensFused(col("text")).as("__toks"))
    val corpus = toks.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size(col("__toks")).cast("long")), lit(0L)).as("total_tf"))
    val tf = Dedup.track(toks
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist())
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val scored = tf
      .join(broadcast(withWeight(dfreq)), Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("__num",
        d("tf") * d("total_tf") * lit(44000000L).cast("decimal(38,0)"))
      .withColumn("__den",
        d("tf") * d("total_tf") * lit(20) + d("total_tf") * lit(6) +
          d("dl") * d("n_docs") * lit(18))
      // IntegralDivide on decimals: exact truncating division → BIGINT
      // (never the rounded decimal `/`, whose scale-6 quotient could
      // round up across the floor boundary)
      .withColumn("tfsat_ppm", expr("__num div __den"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("tfsat_ppm").cast("decimal(38,0)") * d("w_ppb"))
          .cast("long").as("score"))
    Ranks.topN(scored, Seq(col("score").desc, col("doc_id").asc), k)
      .select(col("doc_id"), col("n_terms"), col("score"), col("rank"))
  }

  /** Batch retrieval: MANY queries answered in one pass — the shape
    * decontamination audits and eval harvesting need (a million probe
    * queries against the corpus is a join, not a loop). `queries` is a
    * DataFrame (query_id, query); each row is normalized by the pinned
    * tokenizer into a DEDUPED term set (matching [[searchTopK]]'s
    * per-query semantics), joined to the corpus postings on term, and
    * scored per (query_id, doc). Per-query top-k is a rank over the
    * (query_id)-partitioned window — Spark's WindowGroupLimit prunes to
    * k rows per query BEFORE the final shuffle, so the plan never
    * materializes full per-query rankings.
    *
    * df is corpus-global per term (computed over the matched postings —
    * identical to searchTopK's, since a term's candidate set does not
    * depend on which query asked). Output: (query_id, doc_id, n_terms,
    * score_ppb, rank 1..k). */
  def searchMany(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val qterms = queries
      .select(col("query_id"),
        explode(array_distinct(tokensFused(col("query")))).as("term"))
    val tf = Dedup.track(
      postings(docs)
        .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
        .persist())
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib =
      (col("tf").cast("decimal(38,0)") * col("w_ppb").cast("decimal(38,0)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppb").desc, col("doc_id").asc)
    tf
      .join(qterms, Seq("term"))
      .join(broadcast(withWeight(dfreq)), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(contrib).cast("long").as("score_ppb"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        col("score_ppb"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) over any number
    * of ranked lists: each list contributes `10^9 div (c + rank)` per
    * doc and the fused score is the sum — rank-only, so lists with
    * incomparable score scales (keyword ppb vs cosine) fuse soundly.
    * Integer-exact on both engines; c=60 is the published default.
    * Inputs need only (doc_id, rank); a doc absent from a list simply
    * contributes nothing. Ties in the fused k-cut break by doc_id. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(c >= 0, s"rrf constant must be non-negative, got $c")
    val u = rankings
      .map(_.select(col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
    val fused = u
      .withColumn("__w", expr(s"CAST(1000000000 AS BIGINT) div ($c + rank)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("__w")).cast("long").as("rrf_ppb"))
    Ranks.topN(fused, Seq(col("rrf_ppb").desc, col("doc_id").asc), k)
      .select(col("doc_id"), col("n_lists"), col("rrf_ppb"), col("rank"))
  }

  /** Hybrid retrieval: the keyword ranking ([[searchTopK]]) fused with
    * a vector ranking (brute-force cosine here — the exact baseline;
    * swap in Ivf.topK postings for the 100 TB path, the fusion only
    * sees (doc_id, rank)) by reciprocal-rank fusion. `queryVec` is ONE
    * query row (vec_id, embedding) in the documents' id space; the
    * query's own doc is excluded on the vector side (bruteForceTopK's
    * self-exclusion) but may surface via keywords. */
  def hybridTopK(docs: DataFrame, emb: DataFrame, query: Seq[String],
      queryVec: DataFrame, k: Int = 10, kCand: Int = 20): DataFrame =
    rrfFuse(Seq(
      searchTopK(docs, query, kCand).select(col("doc_id"), col("rank")),
      Similarity.bruteForceTopK(emb, queryVec, kCand)
        .select(col("vec_id").as("doc_id"), col("rk").as("rank"))), k)

  /** "More like this": retrieve the docs most similar to a seed doc by
    * its own dominant terms. The seed profile is the doc's top-`nTerms`
    * tokens by in-doc tf (tie: term asc) — one tiny single-doc agg, no
    * corpus pass; those terms then run the standard scored search. df
    * is corpus-global (seed included); the seed doc itself is excluded
    * from the results. */
  def moreLikeThis(docs: DataFrame, docId: Long, nTerms: Int = 5,
      k: Int = 10): DataFrame = {
    // the seed profile is ≤ nTerms rows — collect it (driver-tiny,
    // deterministic) so the corpus pass goes through queryTf and gets
    // its lossless substring prefilter: without it this was the one
    // search path that tokenized every doc, the cost queryTf's scaladoc
    // names as THE corpus-scan cost
    val terms = docs.filter(col("doc_id") === docId)
      .select(explode(tokensFused(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term").asc).limit(nTerms)
      .select(col("term")).collect().map(_.getString(0)).toSeq
    if (terms.isEmpty) return emptyResult(docs.sparkSession)
    val tfAll = Dedup.track(queryTf(docs, terms).persist())
    scoreTopK(
      tfAll.filter(col("doc_id") =!= docId),
      tfAll.groupBy(col("term")).agg(count(lit(1)).as("df")), k)
  }

  // ===== Persisted term-bucketed index =====

  /** Number of term-hash buckets the persisted postings are partitioned
    * into. Each query term maps to one bucket dir, so a q-term search
    * reads ≤ q partitions regardless of index size. */
  val DefaultBuckets = 64

  private def bucketOf(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(lit("graft-search"), term), lit(nBuckets.toLong))

  /** Persist the inverted index at `path`: postings partitioned by
    * term-hash bucket (`path/postings/bucket=<n>`) plus the term-stats
    * sidecar (`path/terms`, carrying each term's bucket so readers
    * derive the prune set from data, not from re-hashing assumptions).
    * The layout is content-addressed by the pinned hash — a reader and
    * writer can only disagree if the code changes, and the sidecar
    * bucket column makes even that loud (prune-miss = term absent from
    * its own bucket = zero hits, caught by the spec's parity gate). */
  def writeIndex(docs: DataFrame, path: String, nBuckets: Int = DefaultBuckets): Unit = {
    val post = Dedup.track(postings(docs).persist())
    post
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(path + "/postings")
    statsOf(post)
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
      .write.mode("overwrite").parquet(path + "/terms")
  }

  /** Serve a disjunctive top-k search from a persisted index. Reads the
    * tiny terms sidecar first (filtered to the query), collects the
    * (term, df, bucket) rows — driver-tiny, ≤ |query| — and scans ONLY
    * those bucket dirs of the postings (partition pruning; the spec
    * asserts the numFiles metric). Identical results to
    * [[searchTopK]] over the source corpus, by construction and by the
    * catalog's shared oracle. */
  def searchIndexed(spark: SparkSession, path: String, query: Seq[String],
      k: Int = 10): DataFrame = {
    val terms = queryTerms(query)
    val stats = spark.read.parquet(path + "/terms")
      .filter(col("term").isin(terms: _*))
      .select(col("term"), col("df"), col("bucket"))
      .collect()
    if (stats.isEmpty) return emptyResult(spark)
    val buckets = stats.map(_.getAs[Long]("bucket")).distinct.toSeq
    val dfreq = spark.createDataFrame(
      spark.sparkContext.parallelize(
        stats.toSeq.map(r => org.apache.spark.sql.Row(
          r.getAs[String]("term"), r.getAs[Long]("df"))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("df",
          org.apache.spark.sql.types.LongType))))
    val tf = spark.read.parquet(path + "/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("tf"))
    scoreTopK(tf, dfreq, k)
  }

  private def emptyResult(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("n_terms", LongType),
        StructField("score_ppb", LongType), StructField("rank", LongType))))
  }
}
