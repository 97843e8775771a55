package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.plans.GraftFunctions
import graft.tables.Tables

class PlansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("tokenize Generator matches TextFunctions.tokens on every document") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    docs.createOrReplaceTempView("plans_docs")
    val viaGen = spark.sql(
      "SELECT word, COUNT(*) AS ct FROM plans_docs LATERAL VIEW tokenize(text) t AS word GROUP BY word")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaExplode = docs.select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaGen === viaExplode)
  }

  test("fused CosineSimilarity is bit-identical to the compositional form") {
    val emb = Tables.embeddings(spark, dir)
    val v = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("e"))
    val q = v.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val joined = v.crossJoin(q).filter(col("qid") =!= col("vec_id"))
    val fused = joined.select(
      graft.plans.VectorExpressions.cosineFused(col("qe"), col("e")).as("s"))
      .collect().map(_.getDouble(0))
    val comp = joined.select(
      graft.functions.VectorFunctions.cosine(col("qe"), col("e")).as("s"))
      .collect().map(_.getDouble(0))
    assert(fused.length === comp.length && fused.length > 0)
    fused.zip(comp).foreach { case (f, c) => assert(f === c) }
  }

  test("tokenize Generator runs inside WholeStageCodegen (no fallback)") {
    GraftFunctions.register(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("plans_docs_cg")
    val df = spark.sql(
      "SELECT word FROM plans_docs_cg LATERAL VIEW tokenize(text) t AS word")
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Generate""".r.findFirstIn(plan).isDefined,
      s"Generate not codegen'd:\n$plan")
    assert(df.count() > 0)
  }

  test("fused bloom_hits == the per-row UDF loop; no ScalaUDF left in the plan") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    // the operator's real input domain: bound distinct-4-gram arrays, a
    // filter built from the doc_id % 23 benchmark slice's grams
    val grams = docs
      .select(col("doc_id"), TextFunctions.tokensFused(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(TextFunctions.wordShingles(col("toks"), 4)).as("g"))
      .filter(size(col("g")) > 0).persist()
    try {
      val bench = grams.filter(col("doc_id") % 23 === 0)
        .select(explode(col("g")).as("gram")).distinct()
      val nGrams = bench.count()
      assert(nGrams > 0)
      val bf = bench.stat.bloomFilter("gram", nGrams, 1e-6)
      val bfB = spark.sparkContext.broadcast(bf)
      val handle = graft.plans.BloomHandles.register(bfB)
      val udfHits = udf((arr: scala.collection.Seq[String]) =>
        arr.count(g => bfB.value.mightContainString(g)).toLong)
      val both = grams.select(
        call_function("bloom_hits", col("g"), lit(handle)).as("f"),
        udfHits(col("g")).as("c"))
      assert(both.filter(not(col("f") <=> col("c"))).count() === 0)
      assert(both.filter(col("f") > 0).count() > 0, "fixture must have hits")
      // the production path (bloomScoreBroadcast) must carry NO ScalaUDF
      val plan = graft.operators.TextAnalysis
        .bloomScoreBroadcast(docs, bfB, n = 4)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF") && !plan.contains("UDF("),
        s"interpreted UDF left in the bloom scoring plan:\n$plan")
      assert(plan.contains("bloomhits") || plan.contains("bloom_hits") ||
        plan.toLowerCase.contains("bloomhits"), s"fused expression missing:\n$plan")
      graft.plans.BloomHandles.deregister(handle)
    } finally { grams.unpersist(blocking = false); () }
  }

  test("BloomHandles lifecycle: empty at rest across repeated curations; stale id fails loudly") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val base = graft.plans.BloomHandles.size
    var staleId = -1L
    // three independent "curations", each broadcasting its OWN filter:
    // the round-11 registry kept every handle for the driver's lifetime
    (1 to 3).foreach { _ =>
      val bf = graft.operators.TextAnalysis.benchmarkBloom(bench, n = 4).get
      val bfB = spark.sparkContext.broadcast(bf)
      staleId = bfB.id
      val scored = graft.operators.TextAnalysis.bloomScoreBroadcast(docs, bfB, n = 4)
      // DataFrames analyze eagerly, so the handle is already deregistered —
      // and execution must NOT consult the registry (BloomHits embeds the
      // Broadcast object): the frame still runs after deregistration
      assert(graft.plans.BloomHandles.size === base,
        "bloom handle registry grew across curations")
      assert(scored.filter(col("n_bf_grams") > 0).count() > 0)
    }
    // a stale handle id fails LOUDLY at analysis, not obscurely at task
    // execution (the builder resolves through BloomHandles.get)
    val e = intercept[Throwable] {
      docs.select(TextFunctions.tokensFused(col("text")).as("toks"))
        .select(call_function("bloom_hits", col("toks"), lit(staleId)))
        .collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("no broadcast Bloom filter registered"),
      s"stale-handle failure not loud: $msgs")
  }

  test("BloomHandles is reference-counted: a shared broadcast survives one caller's release") {
    // the ADVICE r12 race: two threads sharing one Broadcast object —
    // the first caller's finally-deregister must not strand the second
    val bench = Tables.documents(spark, dir).filter(col("doc_id") % 23 === 0)
    val bf = graft.operators.TextAnalysis.benchmarkBloom(bench, n = 4).get
    val bfB = spark.sparkContext.broadcast(bf)
    val base = graft.plans.BloomHandles.size
    val id1 = graft.plans.BloomHandles.register(bfB)
    val id2 = graft.plans.BloomHandles.register(bfB)
    assert(id1 === id2, "same broadcast registers under one id")
    graft.plans.BloomHandles.deregister(id1)
    // the second registrant's reference is still live
    assert(graft.plans.BloomHandles.get(id2) eq bfB)
    graft.plans.BloomHandles.deregister(id2)
    assert(graft.plans.BloomHandles.size === base, "refcount did not drain to empty")
    assert(intercept[IllegalArgumentException] {
      graft.plans.BloomHandles.get(id2)
    }.getMessage.contains("no broadcast Bloom filter registered"))
    // double-release of a dead id is a no-op, not an error or a leak
    graft.plans.BloomHandles.deregister(id2)
    assert(graft.plans.BloomHandles.size === base)
  }

  test("non-literal / bad-constant scalar args fail at analysis with clear messages") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFunctions.tokensFused(col("text")).as("toks"))
    // non-foldable n: a clear 'must be an integer literal', not a
    // ClassCastException out of the builder (ADVICE r12)
    val e1 = intercept[Throwable] {
      docs.select(call_function("word_shingles", col("toks"),
        col("doc_id").cast("int"))).collect()
    }
    val m1 = Iterator.iterate(e1)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(m1.contains("must be an integer literal"), s"unclear failure: $m1")
    // bad constant on excise_spans: the normal AnalysisException path,
    // not an IllegalArgumentException thrown out of the analyzer
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(call_function("excise_spans",
        call_function("lower_root", col("toks")(0)),
        call_function("tokenize_spans", col("toks")(0)),
        array().cast("array<int>"), lit(0))).collect()
    }
    assert(e2.getMessage.contains("gram length must be positive"))
  }

  test("fused md5-prefix hash == compositional conv(substring(md5)) chain") {
    GraftFunctions.register(spark)
    val toks = Tables.documents(spark, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
    val pairs = toks.select(
      TextFunctions.hash32(col("t")).as("fused"),
      TextFunctions.hash32Compositional(col("t")).as("comp"))
    assert(pairs.filter(col("fused") =!= col("comp")).count() === 0)
    assert(pairs.count() > 0)
  }

  test("fused shingle_hash32 == per-position compositional shingle+hash chain") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{size => asize}
    for (n <- Seq(2, 3, 4)) {
      val bound = Tables.documents(spark, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(asize(col("toks")) >= n)
      val pairs = bound.select(
        TextFunctions.shingleHash32(col("toks"), n).as("fused"),
        transform(TextFunctions.wordShingles(col("toks"), n),
          s => TextFunctions.hash32Compositional(s)).as("comp"))
      assert(pairs.filter(not(col("fused") <=> col("comp"))).count() === 0,
        s"n=$n positional mismatch")
      assert(pairs.count() > 0)
    }
    // edge shapes on raw arrays (the tokenizer can't produce multi-byte
    // tokens, so feed them directly): exactly n tokens (one shingle),
    // fewer than n (empty array), multi-byte UTF-8 (byte-streaming into
    // the digest must equal hashing the concatenated string)
    import spark.implicits._
    val edge = Seq(
      Seq("a", "b", "c"), Seq("a", "b"),
      Seq("héllo", "wörld", "déjà", "vu")).toDF("toks")
    val er = edge.select(
      TextFunctions.shingleHash32(col("toks"), 3).as("fused"),
      transform(TextFunctions.wordShingles(col("toks"), 3),
        s => TextFunctions.hash32Compositional(s)).as("comp"))
    assert(er.filter(not(col("fused") <=> col("comp"))).count() === 0)
  }

  test("fused jaccard_sorted == array_intersect/array_union on sorted-distinct arrays") {
    GraftFunctions.register(spark)
    val sh = graft.operators.Dedup.shingleSets(Tables.documents(spark, dir)).persist()
    // all-pairs over a slice: every (h_a, h_b) combination including
    // disjoint (jaccard 0) and identical (jaccard 1 via self-pair)
    val a = sh.limit(40).select(col("doc_id").as("doc_a"), col("hashes").as("h_a"))
    val b = sh.limit(40).select(col("doc_id").as("doc_b"), col("hashes").as("h_b"))
    val both = a.crossJoin(b)
      .select(
        call_function("jaccard_sorted", col("h_a"), col("h_b")).as("fused"),
        (size(array_intersect(col("h_a"), col("h_b"))).cast("double") /
          size(array_union(col("h_a"), col("h_b")))).as("comp"),
        call_function("intersect_count_sorted", col("h_a"), col("h_b")).as("fusedCt"),
        size(array_intersect(col("h_a"), col("h_b"))).cast("long").as("compCt"))
      .collect()
    assert(both.length === 1600)
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    both.foreach(r => assert(r.getLong(2) === r.getLong(3)))
    assert(both.exists(_.getDouble(0) == 1.0), "self-pairs must hit jaccard 1")
    assert(both.exists(_.getDouble(0) == 0.0), "disjoint pairs must hit jaccard 0")
    sh.unpersist()
  }

  test("fused HyperplaneSketch == composed dim×nPlanes expression tree") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val fused = graft.operators.Similarity.hyperplaneBuckets(emb, 64, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val composed = graft.operators.Similarity.hyperplaneBucketsComposed(emb, 64, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fused.nonEmpty && fused === composed)
    // and the fused sketch is a SINGLE projected expression, not a tree of
    // dim×nPlanes md5 chains — the plan prints one hyperplanesketch call
    val plan = graft.operators.Similarity.hyperplaneBuckets(emb, 64, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("md5"), s"composed md5 chain leaked into plan:\n$plan")
  }

  test("hyperplane_sketch rejects non-double-array input at analysis time") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    emb.createOrReplaceTempView("plans_emb")
    // raw array<float> must be rejected — getDouble over 4-byte slots would
    // silently produce garbage buckets
    val e = intercept[Exception] {
      spark.sql("SELECT hyperplane_sketch(embedding, 64, 8) FROM plans_emb").collect()
    }
    assert(e.getMessage.contains("ARRAY<DOUBLE>"), e.getMessage)
  }

  test("md5_prefix32 rejects non-string input at analysis time") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(1L, 2L).toDF("n").createOrReplaceTempView("plans_longs")
    val e = intercept[Exception] {
      spark.sql("SELECT md5_prefix32(n) FROM plans_longs").collect()
    }
    assert(e.getMessage.contains("STRING"), e.getMessage)
  }

  test("nfc_normalize: parity with java.text.Normalizer; fast paths; null; type check") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val samples = Seq(
      "plain ascii stays",
      "résumé", // decomposed Latin -> composed
      "résumé", // already NFC: unchanged
      "각", // jamo -> precomposed Hangul syllable
      "mixed åcafé #1", // ring above -> å
      "") // empty
    val got = samples.toDF("s")
      .select(TextFunctions.nfcNormalize(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq
    val want = samples.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(got === want)
    assert(got(1) === "résumé") // composition actually happened
    assert(got(3) === "각") // 각
    // NULL propagates
    val nul = Seq[Option[String]](None).toDF("s")
      .select(TextFunctions.nfcNormalize(col("s"))).collect()(0)
    assert(nul.isNullAt(0))
    // analysis-time rejection of non-string input
    Seq(1L).toDF("n").createOrReplaceTempView("plans_nfc_longs")
    val e = intercept[Exception] {
      spark.sql("SELECT nfc_normalize(n) FROM plans_nfc_longs").collect()
    }
    assert(e.getMessage.contains("STRING"), e.getMessage)
  }

  test("map-side NearestCentroid == crossJoin + window argmin, assign plan exchange-free") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val v = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("e"))
    val centFrame = v.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("e").as("ce"))
    val cents = centFrame.collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Double](1).toVector)).sortBy(_._1)
    // fused map-side argmax
    val fused = v.withColumn("nc", graft.plans.VectorExpressions.nearestCentroid(
        col("e"), cents.map(_._1).toSeq, cents.map(_._2).toSeq))
      .select(col("vec_id"), col("nc").getField("cid").as("cid"),
        col("nc").getField("sim").as("sim"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // reference: the window formulation it replaced
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid").asc)
    val viaWindow = v.crossJoin(broadcast(centFrame))
      .withColumn("sim", graft.plans.VectorExpressions.cosineFused(col("e"), col("ce")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cid").toLong, r.getAs[Double]("sim")))).toMap
    assert(fused.nonEmpty && fused === viaWindow) // bit-identical cid AND sim
    // and the production assign stage (Ivf.index) plans with ZERO exchanges
    val plan = graft.operators.Ivf.index(emb, graft.operators.Ivf.train(emb, 8))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assign stage shuffles:\n$plan")
    graft.operators.Dedup.releaseCaches(spark) // train's tracked centroid cache
  }

  test("map-side NearestSubCentroid == broadcast-join + window per-block argmax") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val v = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("e"))
    // 4 blocks of 16 dims; codebook = blocks of the first 5 vectors
    val blk = v.select(col("vec_id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"), slice(col("e"), b * 16 + 1, 16).as("sub"))): _*)).as("s"))
      .select(col("vec_id"), col("s.b").as("b"), col("s.sub").as("sub"))
    val cbFrame = blk.filter(col("vec_id") < 5)
      .select(col("b"), col("vec_id").cast("int").as("cid"), col("sub").as("ce"))
    val cb = cbFrame.collect().map(r => (r.getInt(0), r.getInt(1).toLong, r.getSeq[Double](2).toVector))
    val ids = Vector.tabulate(4)(b => cb.filter(_._1 == b).sortBy(_._2).map(_._2).toVector)
    val ces = Vector.tabulate(4)(b => cb.filter(_._1 == b).sortBy(_._2).map(_._3).toVector)
    val fused = blk.withColumn("nc",
        graft.plans.VectorExpressions.nearestSubCentroid(col("sub"), col("b"), ids, ces))
      .select(col("vec_id"), col("b"), col("nc").getField("cid").as("cid"),
        col("nc").getField("dot").as("dot"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("b")).orderBy(col("dot").desc, col("cid").asc)
    val viaWindow = blk.join(broadcast(cbFrame), "b")
      .withColumn("dot", aggregate(zip_with(col("sub"), col("ce"), _ * _), lit(0.0), _ + _))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("b")) ->
        ((r.getAs[Int]("cid").toLong, r.getAs[Double]("dot")))).toMap
    assert(fused.nonEmpty && fused === viaWindow)
  }

  test("nearest_centroid NaN rule follows the window form per pass (nanWins)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // centroid 0 is NaN-poisoned, centroid 1 is clean and similar to v
    val v = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "e")
    val cids = Seq(0L, 1L)
    val cents = Seq(Seq(Double.NaN, 0.0), Seq(1.0, 0.1))
    def pick(nanWins: Boolean) = v.select(
      graft.plans.VectorExpressions.nearestCentroid(col("e"), cids, cents, nanWins).as("nc"))
      .select(col("nc").getField("cid")).first().getLong(0)
    // assign semantics (sim DESC window): NaN sorts greatest -> NaN wins
    assert(pick(nanWins = true) === 0L)
    // k-means|| distance semantics (d ASC window): NaN sorts last -> loses
    assert(pick(nanWins = false) === 1L)
  }

  test("nearest_centroid rejects non-double-array input at analysis time") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val e = intercept[Exception] {
      emb.select(graft.plans.VectorExpressions.nearestCentroid(
        col("embedding"), Seq(0L), Seq(Seq(1.0, 2.0)))).collect()
    }
    assert(e.getMessage.contains("ARRAY<DOUBLE>"), e.getMessage)
  }

  test("tokenize Generator handles null and empty input") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(Some("Hello, World"), Some(""), None).toDF("t").createOrReplaceTempView("plans_null")
    val got = spark.sql("SELECT word FROM plans_null LATERAL VIEW tokenize(t) x AS word")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("hello", "world"))
  }

  test("fused minhash_sigs / sorted_distinct_i64 / tokenize_array == compositional forms") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // tokenize_array == filter(split(lower())) on every document PLUS an
    // explicit NULL-text row (the fixture has none — without it the
    // fused kernel's null branch and its nullable=false contract would
    // never execute): fused gives an empty array, compositional on
    // coalesced input gives an empty array
    val withNullText = docs.select(col("text"))
      .unionByName(Seq(Option.empty[String]).toDF("text"))
    val tokPairs = withNullText.select(
      TextFunctions.tokensFused(col("text")).as("fused"),
      TextFunctions.tokens(coalesce(col("text"), lit(""))).as("comp"))
    assert(tokPairs.filter(not(col("fused") <=> col("comp"))).count() === 0)
    // sorted_distinct_i64 == array_sort(array_distinct) on shingle hashes
    val toks = docs.select(TextFunctions.tokensFused(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(TextFunctions.shingleHash32(col("toks"), 3).as("hs"))
    val sdPairs = toks.select(
      TextFunctions.sortedDistinct(col("hs")).as("fused"),
      array_sort(array_distinct(col("hs"))).as("comp"))
    assert(sdPairs.filter(not(col("fused") <=> col("comp"))).count() === 0)
    assert(sdPairs.count() > 0)
    // minhash_sigs == the per-seed minhashSigFromHashes chain, all seeds,
    // plus the empty-array edge (fused: n nulls == n array_min-of-empty)
    val withEmpty = toks.select(TextFunctions.sortedDistinct(col("hs")).as("h"))
      .union(Seq(Seq.empty[Long]).toDF("h"))
    val mhPairs = withEmpty.select(
      TextFunctions.minhashSigsFused(col("h"), 8).as("fused"),
      array((0 until 8).map(s =>
        TextFunctions.minhashSigFromHashes(col("h"), s)): _*).as("comp"))
    assert(mhPairs.filter(not(col("fused") <=> col("comp"))).count() === 0)
    // count_in_set == the size(filter(array_contains)) occurrence count,
    // and subword_est == the aggregate() ceil(len/4) fold — on corpus
    // tokens plus an empty-array row (fold init parity)
    val words = Seq("the", "spark", "batch", "merge", "zzznotaword")
    val tokFrames = docs.select(TextFunctions.tokensFused(col("text")).as("toks"))
      .unionByName(Seq(Seq.empty[String], Seq("a"), Seq("a", "b")).toDF("toks"))
    val csPairs = tokFrames.select(
      TextFunctions.countInSet(col("toks"), words).as("fused"),
      size(filter(col("toks"),
        t => array_contains(typedLit(words), t))).cast("long").as("comp"))
    assert(csPairs.filter(not(col("fused") <=> col("comp"))).count() === 0)
    val swPairs = tokFrames.select(
      TextFunctions.subwordEstimate(col("toks")).as("fused"),
      aggregate(col("toks"), lit(0L),
        (acc, t) => acc + ceil(length(t) / 4.0).cast("long")).as("comp"))
    assert(swPairs.filter(not(col("fused") <=> col("comp"))).count() === 0)
    // word_shingles == the compositional transform+filter pair, at both
    // widths the operators use, incl. the sub-width (m = 0) edges
    val wsPairs = tokFrames.select(
      TextFunctions.wordShingles(col("toks"), 2).as("f2"),
      TextFunctions.wordShinglesCompositional(col("toks"), 2).as("c2"),
      TextFunctions.wordShingles(col("toks"), 3).as("f3"),
      TextFunctions.wordShinglesCompositional(col("toks"), 3).as("c3"))
    assert(wsPairs.filter(
      not(col("f2") <=> col("c2")) || not(col("f3") <=> col("c3"))).count() === 0)
    // char_trigram_set == array_distinct(transform(sequence, substr)) on
    // the langIdNgram normalization of the corpus (+ short/empty edges)
    val padded = docs.select(concat(lit(" "),
        trim(regexp_replace(lower(coalesce(col("text"), lit(""))), "[^a-z0-9]+", " ")),
        lit(" ")).as("s"))
      .unionByName(Seq("  ", " a ", " ab ").toDF("s"))
    val triPairs = padded.select(
      call_function("char_trigram_set", col("s")).as("fused"),
      when(length(col("s")) < 3, array().cast("array<string>"))
        .otherwise(array_distinct(transform(sequence(lit(1), length(col("s")) - 2),
          i => col("s").substr(i, lit(3))))).as("comp"))
    assert(triPairs.filter(not(col("fused") <=> col("comp"))).count() === 0)
    // tokenize_array_cjk == tokens(text, cjk = true) on the corpus PLUS
    // the u2 mixed-script fixture shapes (script boundaries with no
    // whitespace, isolated ideograph, CJK-digit-CJK, NULL, empty) — the
    // fused kernel feeding the curation cjk mode must be bit-identical
    // to the pinned compositional semantics
    val cjkFixture = Seq(
      Some("Spark入门指南 v2.0"), Some("大数据 processing 引擎"),
      Some("流处理"), Some("云"), Some("hello world"), Some("价格:100元"),
      None, Some(""), Some("深度学习模型"), Some("spark引擎fast"),
      Some("我们可以一起去，没有什么问题。")).toDF("text")
    val cjkPairs = docs.select(col("text")).unionByName(cjkFixture).select(
      TextFunctions.tokensFusedCjk(col("text")).as("fused"),
      TextFunctions.tokens(coalesce(col("text"), lit("")), cjk = true).as("comp"))
    assert(cjkPairs.filter(not(col("fused") <=> col("comp"))).count() === 0)
    // sorted_distinct_i64 rejects NULL elements loudly
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("NULL element")) || mentions(t.getCause))
    val e = intercept[Exception] {
      spark.sql("SELECT sorted_distinct_i64(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)))")
        .collect()
    }
    assert(mentions(e), e.toString)
    // minhash_sigs rejects NULL elements the same way (getLong on a NULL
    // slot silently reads 0, fabricating a near-minimal signature where
    // the compositional array_min(transform) SKIPS nulls)
    val e2 = intercept[Exception] {
      spark.sql("SELECT minhash_sigs(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)), 8)")
        .collect()
    }
    assert(mentions(e2), e2.toString)
  }

  test("property: fused kernels == compositional forms on seeded random Unicode (surrogate pairs, astral CJK, CJK range edges, combining marks, NULL/empty)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // seeded generator (deterministic — a failure reproduces): strings
    // are built from CODEPOINTS, so surrogate pairs are always well-
    // formed; the pool deliberately stacks the hazard classes — the CJK
    // block edges (U+4E00/U+9FFF in, U+4DFF/U+A000 out), astral CJK
    // Ext-B (U+20000, a surrogate pair that must fall OUTSIDE the BMP
    // range class), length-changing lowercase (U+0130 → i + combining
    // dot), combining marks, zero-width space, emoji, and plain latin/
    // digit/whitespace/punctuation
    val pool: IndexedSeq[Int] = IndexedSeq(
      'a', 'z', 'q', '0', '9', 'A', 'Z', ' ', '\t', '\n', ',', '.',
      0x3002 /*。*/, 0xFF0C /*，*/,
      0x4E00, 0x9FFF, 0x4DFF, 0xA000, 0x6211, 0x4EEC, 0x4E2D, 0x6587,
      0x00E9 /*é*/, 0x0130 /*İ*/, 'I', 0x0131 /*ı*/,
      0x0301 /*combining acute*/, 0x1F600 /*emoji*/,
      0x20000 /*astral CJK Ext-B*/, 0x200B /*zero-width space*/)
    val rnd = new scala.util.Random(0xC0FFEE)
    def randString(): String = {
      val sb = new java.lang.StringBuilder
      (0 until rnd.nextInt(41)).foreach(_ =>
        sb.appendCodePoint(pool(rnd.nextInt(pool.size))))
      sb.toString
    }
    val rows: Seq[Option[String]] =
      Seq(None, Some("")) ++ (0 until 400).map(_ => Some(randString()))
    val df = rows.toDF("text").persist()
    try {
      // both tokenizers: fused == compositional on every random string
      val tok = df.select(
        TextFunctions.tokensFused(col("text")).as("fl"),
        TextFunctions.tokens(coalesce(col("text"), lit(""))).as("cl"),
        TextFunctions.tokensFusedCjk(col("text")).as("fc"),
        TextFunctions.tokens(coalesce(col("text"), lit("")), cjk = true).as("cc"))
      assert(tok.filter(not(col("fl") <=> col("cl"))).count() === 0)
      assert(tok.filter(not(col("fc") <=> col("cc"))).count() === 0)
      // count_in_set / word_shingles over the random CJK-mode token
      // arrays (the contract domain: tokenizer output), mixed zh + latin
      // probe set so both script arms of the set can hit
      val words = Seq("我们", "什么", "a", "z", "0", "i̇", "zzznope")
      val toks = df.select(TextFunctions.tokensFusedCjk(col("text")).as("toks"))
      val cs = toks.select(
        TextFunctions.countInSet(col("toks"), words).as("f"),
        size(filter(col("toks"),
          t => array_contains(typedLit(words), t))).cast("long").as("c"))
      assert(cs.filter(not(col("f") <=> col("c"))).count() === 0)
      val ws = toks.select(
        TextFunctions.wordShingles(col("toks"), 2).as("f2"),
        TextFunctions.wordShinglesCompositional(col("toks"), 2).as("c2"),
        TextFunctions.wordShingles(col("toks"), 3).as("f3"),
        TextFunctions.wordShinglesCompositional(col("toks"), 3).as("c3"))
      assert(ws.filter(
        not(col("f2") <=> col("c2")) || not(col("f3") <=> col("c3"))).count() === 0)
      // char_trigram_set over its real input domain (the langIdNgram
      // [^a-z0-9]→space normalization of the random strings — the
      // kernel's documented ASCII precondition holds by construction)
      val padded = df.select(concat(lit(" "),
        trim(regexp_replace(lower(coalesce(col("text"), lit(""))), "[^a-z0-9]+", " ")),
        lit(" ")).as("s"))
      val tri = padded.select(
        call_function("char_trigram_set", col("s")).as("f"),
        when(length(col("s")) < 3, array().cast("array<string>"))
          .otherwise(array_distinct(transform(sequence(lit(1), length(col("s")) - 2),
            i => col("s").substr(i, lit(3))))).as("c"))
      assert(tri.filter(not(col("f") <=> col("c"))).count() === 0)
      // the hash/shingle/minhash kernel family on the same random domain
      // (tokens of random Unicode; hashes derived from them)
      val h = df.select(
        TextFunctions.hash32(col("text")).as("f"),
        TextFunctions.hash32Compositional(col("text")).as("c"))
      assert(h.filter(not(col("f") <=> col("c"))).count() === 0)
      val sh = toks.select(col("toks"),
        TextFunctions.shingleHash32(col("toks"), 3).as("f"),
        transform(TextFunctions.wordShinglesCompositional(col("toks"), 3),
          g => TextFunctions.hash32Compositional(g)).as("c"))
      assert(sh.filter(not(col("f") <=> col("c"))).count() === 0)
      val hashes = toks
        .select(TextFunctions.shingleHash32(col("toks"), 2).as("hs"))
      val sd = hashes.select(
        TextFunctions.sortedDistinct(col("hs")).as("sf"),
        array_sort(array_distinct(col("hs"))).as("sc"),
        TextFunctions.minhashSigsFused(col("hs"), 8).as("mf"),
        array((0 until 8).map(s =>
          TextFunctions.minhashSigFromHashes(col("hs"), s)): _*).as("mc"))
      assert(sd.filter(
        not(col("sf") <=> col("sc")) || not(col("mf") <=> col("mc"))).count() === 0)
      val sw = toks.select(
        TextFunctions.subwordEstimate(col("toks")).as("f"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => acc + ceil(length(t) / 4.0).cast("long")).as("c"))
      assert(sw.filter(not(col("f") <=> col("c"))).count() === 0)
      // nfc_normalize vs java.text.Normalizer on the random strings (the
      // combining-mark pool entries compose here: e.g. e + U+0301 → é)
      val nfcExpected = udf((s: String) =>
        if (s == null) null
        else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      val nfc = df.select(
        TextFunctions.nfcNormalize(col("text")).as("f"),
        nfcExpected(col("text")).as("c"))
      assert(nfc.filter(not(col("f") <=> col("c"))).count() === 0)
      // tokenize_spans_cjk: token text bit-identical to tokenize_array_cjk
      // on every random string, and every span cuts EXACTLY its token out
      // of lower_root(text) at CODEPOINT offsets — the astral pool entries
      // (emoji, CJK Ext-B surrogate pairs) are separators that advance the
      // offset by ONE codepoint, so a char-vs-codepoint bug fails here
      val sp = df.select(
        call_function("lower_root", coalesce(col("text"), lit(""))).as("lt"),
        call_function("tokenize_spans_cjk", col("text")).as("spans"),
        TextFunctions.tokensFusedCjk(col("text")).as("toks"))
      assert(sp.filter(not(
        transform(col("spans"), x => x("t")) <=> col("toks"))).count() === 0)
      assert(sp.filter(not(forall(col("spans"), x =>
        x("s") >= 0 && x("e") <= length(col("lt")) && x("s") < x("e") &&
          col("lt").substr(x("s") + 1, x("e") - x("s")) === x("t"))))
        .count() === 0)
      // the native spans.t projection (GetArrayStructFields — what the
      // cjk gram side now rides) == the interpreted transform form
      assert(sp.filter(not(
        col("spans").getField("t") <=> col("toks"))).count() === 0)
      // tokenize_spans (the latin twin, round 12 — powers structure-
      // preserving latin excision): token text bit-identical to the
      // latin fused tokenizer, every span substr-reproduces its token
      // at CODEPOINT offsets (astral separators advance by one)
      val spl = df.select(
        call_function("lower_root", coalesce(col("text"), lit(""))).as("lt"),
        call_function("tokenize_spans", col("text")).as("spans"),
        TextFunctions.tokensFused(col("text")).as("toks"))
      assert(spl.filter(not(
        col("spans").getField("t") <=> col("toks"))).count() === 0)
      assert(spl.filter(not(forall(col("spans"), x =>
        x("s") >= 0 && x("e") <= length(col("lt")) && x("s") < x("e") &&
          col("lt").substr(x("s") + 1, x("e") - x("s")) === x("t"))))
        .count() === 0)
      // excise_spans: the fused excision rebuild bit-identical to the
      // compositional four-lambda chain it replaced (cov expansion →
      // character ranges → sorted union fold), both span kernels, at
      // two gram lengths, over hit sets with overlapping ranges
      for ((spansFn, lbl) <- Seq("tokenize_spans" -> "latin",
        "tokenize_spans_cjk" -> "cjk"); n <- Seq(2, 4)) {
        val maxP = size(col("spans")) - n
        val hpCol = when(maxP >= 0,
          filter(sequence(lit(0), greatest(maxP, lit(0))),
            p => pmod(p, lit(3)) === 0))
          .otherwise(array().cast("array<int>"))
        val base = df.select(
          call_function("lower_root", coalesce(col("text"), lit(""))).as("lt"),
          call_function(spansFn, col("text")).as("spans"))
          .select(col("lt"), col("spans"), hpCol.as("hp"))
        val cov = array_distinct(flatten(transform(col("hp"),
          p => sequence(p, p + lit(n - 1)))))
        val cspans = array_sort(transform(cov, i =>
          struct(element_at(col("spans"), i + 1)("s").as("s"),
            element_at(col("spans"), i + 1)("e").as("e"))))
        val rebuilt = aggregate(cspans,
          struct(lit(0).as("last"), lit("").as("acc")),
          (st, sp) => struct(
            greatest(st("last"), sp("e")).as("last"),
            concat(st("acc"),
              when(sp("s") > st("last"),
                col("lt").substr(st("last") + 1, sp("s") - st("last")))
                .otherwise(lit(""))).as("acc")),
          st => concat(st("acc"),
            col("lt").substr(st("last") + 1, length(col("lt")) - st("last"))))
        val both = base.select(
          call_function("excise_spans", col("lt"), col("spans"),
            col("hp"), lit(n)).as("f"),
          struct(rebuilt.as("text"), size(cov).as("n_removed")).as("c"),
          col("lt"))
        assert(both.filter(not(col("f") <=> col("c"))).count() === 0,
          s"excise_spans diverged ($lbl, n=$n)")
        // NULL hit array (the clean-doc left-join case): unchanged text
        val clean = base.select(col("lt"),
          call_function("excise_spans", col("lt"), col("spans"),
            lit(null).cast("array<int>"), lit(n)).as("f"))
        assert(clean.filter(not(col("f")("text") <=> col("lt")) ||
          col("f")("n_removed") =!= 0).count() === 0,
          s"excise_spans null-hp not identity ($lbl, n=$n)")
      }
      // chunk_spans_cjk: the fused chunk build bit-identical to the
      // compositional transform(sequence)/slice/concat_ws/element_at
      // chain it replaced (Dedup.chunkTableCjk), across chunk sizes
      // incl. k=1 (every token its own chunk) and k > any doc's tokens
      for (k <- Seq(1, 3, 8, 64)) {
        val nChunks = ceil(size(col("spans")).cast("double") / k).cast("int")
        val compositional = when(size(col("spans")) > 0,
          transform(sequence(lit(0), nChunks - 1), i => struct(
            i.as("pos"),
            concat_ws(" ",
              transform(slice(col("spans"), i * k + 1, lit(k)), x => x("t"))).as("span"),
            element_at(col("spans"), i * k + 1)("s").as("cs"),
            coalesce(try_element_at(col("spans"), (i + 1) * k + 1)("s"),
              length(col("lt"))).as("ce"))))
          .otherwise(array().cast("array<struct<pos:int,span:string,cs:int,ce:int>>"))
        assert(sp.filter(not(
          call_function("chunk_spans_cjk", col("spans"), length(col("lt")), lit(k))
            <=> compositional)).count() === 0, s"chunk_spans_cjk k=$k diverged")
      }
    } finally { df.unpersist(blocking = false); () }
  }

  test("lower_root: Locale.ROOT lowering, immune to a tr default locale; == lower() on ASCII") {
    GraftFunctions.register(spark)
    val prev = java.util.Locale.getDefault
    try {
      // under tr-TR, default-locale lowering turns "INFO" into "ınfo"
      // (dotless i) once the string has ANY non-ASCII char — the exact
      // divergence that made the search prefilter drop true hits
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val got = graft.plans.NormalizeExpressions.lowerRoot(
        org.apache.spark.unsafe.types.UTF8String.fromString("Ürün INFO")).toString
      assert(got === "ürün info", s"got '$got' — default-locale lowering leaked in")
    } finally java.util.Locale.setDefault(prev)
    // on the (ASCII) corpus the expression equals Spark's lower()
    val n = Tables.documents(spark, dir)
      .select(call_function("lower_root", col("text")).as("a"),
        lower(col("text")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(n === 0)
  }

  test("every bench headline compiles under codegen — no silent interpreted fallback") {
    // Regression guard for the round-8 SimHash32Doc bug: a doGenCode with
    // a FIXED-name Java local compiles fine when the expression is emitted
    // once, but the real t_simhash plan (isnotnull(simhash) pushed into
    // the scan as a DataFilter + the projection recomputing it in the same
    // WholeStageCodegen) emits it twice — Janino's "Redefinition of local
    // variable" then SILENTLY drops the stage to interpreted execution:
    // only an ERROR log line, never a test failure, and the bench quietly
    // measures the interpreted path. Toy two-column repros do NOT trigger
    // it (subexpression elimination merges the duplicates), so the guard
    // runs the ACTUAL headline queries with spark.sql.codegen.fallback
    // disabled, turning any codegen compile failure anywhere in a bench
    // plan into a loud test failure.
    GraftFunctions.register(spark)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      SparkEntry.headlines.foreach { name =>
        try SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          fail(s"headline $name failed under codegen-only execution: $e")
        }
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
      graft.pipeline.Curate.releaseCaches(spark)
    }
  }
}
