package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.tables.Tables

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("brute-force top-k: k rows per query, rank-ordered by sim") {
    val emb = Tables.embeddings(spark, dir)
    val top = Similarity.bruteForceTopK(emb, emb.filter(emb("vec_id") < 3), 5).collect()
    val byQ = top.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    for ((_, rows) <- byQ) {
      assert(rows.length === 5)
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("contrastiveMine: hand-checkable positives and hard negatives, self excluded") {
    import spark.implicits._
    val vecs = Seq(
      (0L, 7L, Seq(1.0f, 0.0f)),    // the query, label 7
      (1L, 7L, Seq(0.9f, 0.1f)),    // same-label near -> the positive
      (2L, 7L, Seq(0.0f, 1.0f)),    // same-label far
      (3L, 9L, Seq(0.95f, 0.05f)),  // other-label near -> the HARD negative
      (4L, 9L, Seq(-1.0f, 0.0f)))   // other-label far
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.contrastiveMine(vecs, vecs.filter($"vec_id" === 0L),
        kPos = 1, kNeg = 1)
      .collect().map(r => (r.getAs[String]("role"), r.getAs[Long]("vec_id"))).toSet
    assert(got === Set(("pos", 1L), ("neg", 3L)))
    // full-k cuts: per query, kPos same-label rows + kNeg other-label rows
    val emb = Tables.embeddings(spark, dir)
    val mined = Similarity.contrastiveMine(emb, emb.filter(emb("vec_id") < 4),
      kPos = 2, kNeg = 3).collect()
    val byQR = mined.groupBy(r => (r.getAs[Long]("qid"), r.getAs[String]("role")))
      .view.mapValues(_.length).toMap
    for (q <- 0L until 4L) {
      assert(byQR((q, "pos")) === 2, s"query $q positives")
      assert(byQR((q, "neg")) === 3, s"query $q negatives")
    }
    assert(!mined.exists(r => r.getAs[Long]("qid") == r.getAs[Long]("vec_id")))
    // hard negatives beat the positives' tail: within a role, sims descend
    mined.groupBy(r => (r.getAs[Long]("qid"), r.getAs[String]("role"))).values.foreach { rs =>
      val sims = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH buckets are deterministic and bounded") {
    val emb = Tables.embeddings(spark, dir)
    val b1 = Similarity.hyperplaneBuckets(emb, 64).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b2 = Similarity.hyperplaneBuckets(emb, 64).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(b1 === b2)
    assert(b1.values.forall(b => b >= 0 && b < 256))
  }

  test("bucketed near-dup pairs == exact O(N²) pairs (recall-complete here)") {
    val emb = Tables.embeddings(spark, dir)
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = toSet(Similarity.cosineNearDupPairs(emb, 0.45))
    val bucketed = toSet(Similarity.cosineNearDupPairsBucketed(emb, 0.45, dim = 64))
    assert(exact.nonEmpty && bucketed === exact)
  }

  test("sharp banding (rowsPerBand=4, 64 sketch bits) stays pair-identical") {
    val emb = Tables.embeddings(spark, dir)
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 0.46 sits just under the corpus' sf0.001 max pair similarity
    // (0.479), so the identity is proven on REAL pairs, not vacuously
    val exact = toSet(Similarity.cosineNearDupPairs(emb, 0.46))
    val sharp = toSet(Similarity.cosineNearDupPairsBucketed(
      emb, 0.46, dim = 64, rowsPerBand = 4, nBands = 16, probeHamming1 = true))
    assert(exact.nonEmpty && sharp === exact)
    // probing only ever ADDS candidates pre-rescore — the bare form is a
    // subset of the probed one (it missed 2/89 true pairs at sf0.1)
    val bare = toSet(Similarity.cosineNearDupPairsBucketed(
      emb, 0.46, dim = 64, rowsPerBand = 4, nBands = 16))
    assert(bare.subsetOf(sharp))
    // the boundary pairs differ per corpus — prove the identity on the
    // next SF up too (sf0.01: 7 true pairs; exact is 5000² ≈ 12.5M
    // cosines, still unit-test cheap). sf0.1 is checked by the driver's
    // DuckDB oracle (t_dedup_embedding_bucketed_hi).
    val dir01 = "/root/testdata/sf0.01"
    if (new java.io.File(dir01 + "/embeddings.parquet").exists()) {
      val emb01 = Tables.embeddings(spark, dir01)
      val exact01 = toSet(Similarity.cosineNearDupPairs(emb01, 0.46))
      val sharp01 = toSet(Similarity.cosineNearDupPairsBucketed(
        emb01, 0.46, dim = 64, rowsPerBand = 4, nBands = 16, probeHamming1 = true))
      assert(exact01.nonEmpty && sharp01 === exact01)
    }
  }

  test("sketch-width guards reject > 64 bits instead of silently aliasing") {
    val emb = Tables.embeddings(spark, dir)
    // Java's long shift is mod 64 — 65 planes would alias plane 64 onto
    // bit 0 and produce colliding buckets with no error
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairsBucketed(emb, 0.5, dim = 64,
        rowsPerBand = 4, nBands = 24)
    }
    intercept[Exception] {
      Similarity.hyperplaneBuckets(emb, 64, nPlanes = 65).collect()
    }
  }

  test("multi-probe LSH recall >= single-probe recall (and candidates superset)") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(emb("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = hits(Similarity.lshTopK(emb, q, 64, 10, nPlanes = 4))
    val multi = hits(Similarity.lshTopKMultiProbe(emb, q, 64, 10, nPlanes = 4))
    // flipping one bit only ADDS probed buckets, so the multi-probe top-k
    // pool is a superset and recall cannot drop (measured 3-5x higher on
    // the synthetic corpus: 0.575 vs 0.175 at sf0.01, SCALE.md)
    assert((multi & exact).size >= (single & exact).size)
    assert(multi.size >= single.size)
  }

  test("LSH top-k: same-bucket neighbors agree with brute force scores") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(emb("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(emb, q, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(emb, q, 64, 5).collect()
    assert(lsh.nonEmpty)
    // every ANN hit must carry the exact brute-force score when it appears
    // in the brute-force top-50 (identical arithmetic)
    for (r <- lsh) {
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(s => assert(s === r.getDouble(2)))
    }
  }

  test("semantic dedup == exact pairs filtered to same-cluster, no cartesian") {
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.orderBy(emb("vec_id")).limit(8).collect()
    val cids = seeds.map(_.getLong(0)).toSeq
    val cents = seeds.map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val sem = Similarity.semanticDedupPairs(emb, cids, cents, 0.4)
    val plan = sem.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // independent driver-side brute force, mirroring the expression's
    // single-pass accumulation (dot/nx/ny ascending j, first-win argmax)
    val vecs = emb.orderBy(emb("vec_id")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(u: Array[Double], v: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var j = 0
      while (j < u.length) { dot += u(j) * v(j); nx += u(j) * u(j); ny += v(j) * v(j); j += 1 }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val seedArr = cids.zip(cents.map(_.toArray)).toArray
    val assign = vecs.map { case (v, e) =>
      var bestCid = 0L; var best = 0.0; var first = true
      for ((c, ce) <- seedArr) {
        val s = cos(e, ce)
        if (first || s > best) { best = s; bestCid = c; first = false }
      }
      v -> bestCid
    }.toMap
    val exact = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      if assign(vecs(i)._1) == assign(vecs(j)._1)
      s = cos(vecs(i)._2, vecs(j)._2) if s >= 0.4
    } yield (assign(vecs(i)._1), vecs(i)._1, vecs(j)._1)).toSet
    val got = sem.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === exact)
  }

  test("semanticPrune: per-cluster quota by score, WindowGroupLimit plan, exchange-free assign") {
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.orderBy(emb("vec_id")).limit(4).collect()
    val cids = seeds.map(_.getLong(0)).toSeq
    val cents = seeds.map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val pruned = Similarity.semanticPrune(emb,
      org.apache.spark.sql.functions.col("label"), cids, cents, keepPerCluster = 10)
    val plan = pruned.queryExecution.executedPlan.toString
    // constant-k rank filter must plan as a map-side group limit
    assert(plan.contains("WindowGroupLimit"), plan)
    val rows = pruned.collect().map(r =>
      (r.getLong(0), r.getAs[Long]("cid"), r.getAs[Int]("label")))
    val byCid = rows.groupBy(_._2)
    assert(byCid.nonEmpty && byCid.values.forall(_.length <= 10))
    assert(byCid.values.exists(_.length == 10), "quota must bite somewhere")
    // within each cluster the kept rows are the top-scored of that cluster:
    // recompute assignment driver-side and compare the per-cluster cut
    def cos(u: Array[Double], v: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var j = 0
      while (j < u.length) { dot += u(j) * v(j); nx += u(j) * u(j); ny += v(j) * v(j); j += 1 }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val all = emb.select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val seedArr = cids.zip(cents.map(_.toArray))
    val expect = all.map { case (v, e, l) =>
      var bestCid = 0L; var best = 0.0; var first = true
      for ((c, ce) <- seedArr) {
        val s = cos(e, ce)
        if (first || s > best) { best = s; bestCid = c; first = false }
      }
      (v, bestCid, l)
    }.groupBy(_._2).values.flatMap { members =>
      members.sortBy(m => (-m._3, m._1)).take(10)
    }.toSet
    assert(rows.toSet === expect)
  }

  test("semantic decontamination == exact bipartite check; every corpus vector labeled") {
    val emb = Tables.embeddings(spark, dir)
    val bench = emb.filter(emb("vec_id") % 7 === 0)
    val corpus = emb.filter(emb("vec_id") % 7 =!= 0)
      .unionByName(bench.filter(emb("vec_id") % 2 === 0)
        .withColumn("vec_id", emb("vec_id") + 100000L)) // verbatim copies: cosine 1
    val got = Similarity.decontaminateEmbeddings(corpus, bench, 0.46, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // exact bipartite brute force as the independent witness
    def arr(df: org.apache.spark.sql.DataFrame) = df.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(u: Array[Double], v: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var j = 0
      while (j < u.length) { dot += u(j) * v(j); nx += u(j) * u(j); ny += v(j) * v(j); j += 1 }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val benchA = arr(bench)
    val exact = arr(corpus).map { case (v, e) =>
      v -> benchA.exists { case (_, be) => cos(e, be) >= 0.46 }
    }.toMap
    assert(got.keySet === exact.keySet, "every corpus vector must be labeled")
    assert(got.count(_._2) > 0, "planted copies must flag contaminated")
    assert(got === exact,
      s"diff=${got.toSet.diff(exact.toSet)} missing=${exact.toSet.diff(got.toSet)}")
  }

  test("mmrFromCandidates: IVF candidates at full probe width == exact-baseline MMR") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 3)
    val cents = graft.operators.Ivf.train(emb, k = 4)
    val indexed = graft.operators.Ivf.index(emb, cents)
    // full probe width => IVF candidates == brute-force candidates, so
    // the greedy must produce the identical diversified set
    val ivfCand = graft.operators.Ivf.topK(indexed, cents, queries, k = 12, nprobe = 4)
    val viaIvf = Similarity.mmrFromCandidates(ivfCand, emb, k = 4, lambdaPct = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val exact = Similarity.mmrTopK(emb, queries, k = 4, kCand = 12, lambdaPct = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaIvf === exact && exact.nonEmpty)
    graft.operators.Dedup.releaseCaches(spark)
  }
}
