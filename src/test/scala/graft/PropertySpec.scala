package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** Property-style checks of the text kernel over scalacheck-generated
  * inputs (fixed seeds — deterministic, no scalatestplus bridge in the
  * offline cache). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val texts: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf(" ", "\t", "!", ",", "--", "Ω")))
      .map(_.mkString)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def tokensOf(batch: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    batch.toDF("t")
      .select(TextFunctions.tokens(col("t")).as("x"))
      .collect().map(_.getSeq[String](0)).toSeq
  }

  test("tokenizer: tokens are nonempty, lowercase-alnum, and idempotent") {
    for (seed <- 1L to 10L) {
      val batch = sample(Gen.listOfN(20, texts), seed)
      val toks = tokensOf(batch)
      toks.flatten.foreach(t => assert(t.nonEmpty && t.matches("[a-z0-9]+"), s"seed=$seed tok=$t"))
      // re-tokenizing the joined tokens is a fixpoint
      assert(tokensOf(toks.map(_.mkString(" "))) === toks, s"seed=$seed")
    }
  }

  test("frame sampling reassembles the original bytes when stride == frame") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val batch = sample(Gen.listOfN(10, texts), seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val docs = batch.toDF("doc_id", "text")
      val frames = graft.operators.Multimodal
        .frameSample(spark, graft.operators.Multimodal.asBinary(docs),
          frameSize = 7, stride = 7)
        .collect().groupBy(_.doc_id)
        .map { case (id, fs) =>
          id -> fs.sortBy(_.frame_idx).flatMap(_.frame).toSeq
        }
      batch.foreach { case (id, t) =>
        val want = t.getBytes("UTF-8").toSeq
        assert(frames.getOrElse(id, Seq.empty) === want, s"seed=$seed doc=$id")
      }
    }
  }

  test("int8 quantization is bounded and sign-preserving on random vectors") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    for (seed <- 1L to 5L) {
      val vecs = sample(Gen.listOfN(10,
        Gen.listOfN(16, Gen.chooseNum(-1e6f, 1e6f))), seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      val rows = vecs.toDF("vec_id", "e")
        .select(col("vec_id"), toDouble(col("e")).as("e"))
        .withColumn("scale", maxAbs(col("e")))
        .select(col("vec_id"), col("e"), quantizeInt8With(col("e"), col("scale")).as("q"))
        .collect()
        .map(r => (r.getSeq[Double](1), r.getSeq[Int](2)))
      rows.foreach { case (e, q) =>
        assert(e.length === q.length)
        q.foreach(x => assert(x >= -127 && x <= 127, s"seed=$seed q=$x"))
        e.zip(q).foreach { case (x, qx) =>
          if (x > 0) assert(qx >= 0) else if (x < 0) assert(qx <= 0)
        }
      }
    }
  }

  test("ngramJaccardPairs == brute force on random low-diversity corpora") {
    import spark.implicits._
    import graft.operators.Dedup
    // small vocabulary => dense gram sharing, the adversarial regime for
    // prefix+positional filtering; thresholds include the 1.0 edge
    val doc: Gen[String] = Gen.chooseNum(3, 15).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a1", "b2", "c3", "d4", "e5", "f6")).map(_.mkString(" ")))
    for ((seed, t) <- Seq((1L, 0.5), (2L, 0.7), (3L, 1.0))) {
      val docs = sample(Gen.listOfN(25, doc), seed)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      val sh = Dedup.shingleSets(docs)
      val brute = sh.select(col("doc_id").as("doc_a"), col("hashes").as("h_a"))
        .crossJoin(sh.select(col("doc_id").as("doc_b"), col("hashes").as("h_b")))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("j", size(array_intersect(col("h_a"), col("h_b"))).cast("double") /
          size(array_union(col("h_a"), col("h_b"))))
        .filter(col("j") >= t).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Dedup.ngramJaccardPairs(docs, n = 3, threshold = t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute, s"seed=$seed t=$t missed=${brute -- got} extra=${got -- brute}")
    }
    Dedup.releaseCaches(spark)
  }

  test("packSequences: window packing equals a sequential fold on random corpora") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val docs = sample(Gen.listOfN(40, texts), seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.operators.Sampling.packSequences(docs, budget = 7, shards = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      for ((_, rows) <- got.groupBy(_._2)) {
        var off = 0L
        for ((_, _, pack, n) <- rows.sortBy(_._1)) {
          assert(pack === off / 7, s"seed=$seed")
          off += n
        }
      }
      assert(got.length === 40)
    }
  }

  test("shuffleRank == driver-side sort by (hash, key) on random key sets") {
    import spark.implicits._
    import graft.operators.Sampling
    for (seed <- 1L to 3L) {
      // sparse, unordered, possibly-negative keys
      val keys = sample(Gen.listOfN(60, Gen.chooseNum(-1000000L, 1000000L)), seed).distinct
      val df = keys.toDF("doc_id")
      val got = Sampling.shuffleRank(df, col("doc_id"), partitions = 7)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // driver-side reference: same sentineled hash, same tie-break
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(k: Long): Long = {
        val hex = md.digest(s"v:$k".getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex, 16)
      }
      val want = keys.sortBy(k => (h(k), k)).zipWithIndex
        .map { case (k, i) => k -> i.toLong }.toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("capPerStratum == driver-side per-stratum top-k on random strata") {
    import spark.implicits._
    import graft.operators.Sampling
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(80,
        Gen.zip(Gen.chooseNum(0L, 10000L), Gen.oneOf("a", "b", "c", "d"))), seed)
        .distinctBy(_._1)
      val df = rows.toDF("doc_id", "src")
      val got = Sampling.capPerStratum(df, col("doc_id"), col("src"), 5)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val md = java.security.MessageDigest.getInstance("MD5")
      // full 32-bit hash order (not mod-10000) — the unbiased-past-10000·k rule
      def h32(k: Long): Long = {
        val hex = md.digest(s"v:$k".getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex, 16)
      }
      val want = rows.groupBy(_._2).flatMap { case (_, members) =>
        members.sortBy(m => (h32(m._1), m._1)).take(5)
      }.toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("simhash of identical token multisets is order-invariant") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val words = sample(
        Gen.listOfN(8, Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))), seed)
      val fwd = words.map(_.mkString(" "))
      val rev = words.map(_.reverse.mkString(" "))
      def hashes(xs: Seq[String]) = xs.toDF("t").select(
        TextFunctions.simhash32(TextFunctions.tokenSet(col("t")))).collect().map(_.getLong(0)).toSeq
      assert(hashes(fwd) === hashes(rev), s"seed=$seed")
    }
  }

  test("anomaly z-flag is invariant under uniform count scaling (the cross-multiply cancels)") {
    import spark.implicits._
    import java.sql.Timestamp
    for (seed <- 1L to 5L) {
      val counts = sample(Gen.listOfN(12, Gen.chooseNum(1L, 50L)), seed)
        .zipWithIndex.map { case (c, i) =>
          ("k", Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), c) }
      def flags(mult: Long) = graft.operators.Anomaly.flagFromCounts(
          counts.map { case (k, b, c) => (k, b, c * mult) }.toDF("key", "bucket", "c"), k = 2)
        .orderBy(col("bucket"))
        .collect().map(r => (r.getLong(3), r.getBoolean(4))).toSeq
      assert(flags(1L) === flags(1000L), s"seed=$seed")
    }
  }

  test("classification metrics: f1 stays between min and max of P/R; tp bounded") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val pairs = sample(Gen.listOfN(60,
        Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.oneOf("a", "b", "c"))), seed)
      val rows = graft.operators.Eval.classificationMetrics(
        pairs.toDF("p", "g"), col("p"), col("g")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (nGold, nPred, tp) = (r.getLong(1), r.getLong(2), r.getLong(3))
        val (p, rec, f1) = (r.getLong(4), r.getLong(5), r.getLong(6))
        assert(tp <= math.min(nGold, nPred), s"seed=$seed $r")
        assert(p <= 1000000L && rec <= 1000000L, s"seed=$seed $r")
        // the harmonic mean sits between min and max (±1 ppm floor jitter);
        // zero-P or zero-R pins f1 to 0
        if (p == 0L || rec == 0L) assert(f1 === 0L, s"seed=$seed $r")
        else assert(f1 >= math.min(p, rec) - 1 && f1 <= math.max(p, rec) + 1,
          s"seed=$seed $r")
      }
    }
  }

  test("retrieval metrics: a permutation of gold's top-k always scores recall=mrr=10^6") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val perm = sample(Gen.const(()).flatMap(_ =>
        Gen.pick(5, 1L to 5L).map(_.toList)), seed)
      val results = perm.zipWithIndex.map { case (v, i) => (1L, v * 10L, (i + 1).toLong) }
      val qrels = (1L to 5L).map(v => (1L, v * 10L, 2L))
      val r = graft.operators.Eval.retrievalMetrics(
        results.toDF("qid", "vec_id", "rank"),
        qrels.toDF("qid", "vec_id", "rel"), k = 5).collect().head
      assert(r.getLong(3) === 1000000L && r.getLong(4) === 1000000L, s"seed=$seed $r")
      // equal grades: any order of the same 5 docs IS an ideal ordering
      assert(r.getLong(5) === 1000000L, s"seed=$seed $r")
    }
  }

  test("calibration: bins partition the input; a perfectly calibrated scorer has ECE 0") {
    import spark.implicits._
    import graft.operators.Eval
    for (seed <- 1L to 8L) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 200).map { _ =>
        (Some(rnd.nextInt(1000001).toLong), Some(rnd.nextBoolean()))
      } ++ Seq((None: Option[Long], Some(true)), (Some(5L), None: Option[Boolean]))
      val df = rows.toDF("s", "p")
      val bins = Eval.calibration(df, col("s"), col("p")).collect()
      // bins partition exactly the non-null rows; every gap is |mean - rate|
      assert(bins.map(_.getLong(1)).sum === 200L, s"seed=$seed")
      bins.foreach { r =>
        assert(r.getLong(5) === math.abs(r.getLong(3) - r.getLong(4)), s"seed=$seed $r")
        assert(r.getLong(0) >= 0 && r.getLong(0) <= 9, s"seed=$seed $r")
      }
      // ECE is the n-weighted mean gap — recompute driver-side
      val ece = Eval.calibrationError(df, col("s"), col("p")).collect().head.getLong(1)
      val want = bins.map(r => r.getLong(1) * r.getLong(5)).sum / bins.map(_.getLong(1)).sum
      assert(ece === want, s"seed=$seed")
    }
    // a scorer whose score IS the positive rate in every bin: all-positive
    // rows at score 10^6, all-negative at 0 -> gap 0 in both bins, ECE 0
    val perfect = (Seq.fill(30)((Some(1000000L), Some(true))) ++
      Seq.fill(20)((Some(0L), Some(false)))).toDF("s", "p")
    val e = Eval.calibrationError(perfect, col("s"), col("p")).collect().head
    assert((e.getLong(0), e.getLong(1)) === ((50L, 0L)))
  }

  test("Ranks.topN: ranks are 1..min(n, rows) and consistent with the total order") {
    import spark.implicits._
    for (seed <- 1L to 6L) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 40L).map(id => (id, rnd.nextInt(10).toLong))
      val df = rows.toDF("doc_id", "score_micro")
      for (n <- Seq(5, 40, 100)) {
        val got = graft.operators.Classify.selectTopN(df, n)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val want = rows.sortBy { case (id, s) => (-s, id) }.take(n)
          .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1L) }
        assert(got.sortBy(_._3).toSeq === want, s"seed=$seed n=$n")
      }
    }
  }

  test("residual codes are deterministic under repartition") {
    import graft.operators.{Ivf, Pq}
    val emb = graft.tables.Tables.embeddings(spark, SparkTestSession.sf0001)
    val cents = Ivf.train(emb, k = 4)
    val idx = Ivf.index(emb, cents).persist()
    val cb = Pq.trainResidual(idx, cents, dim = 64, m = 8, ksub = 8, iters = 1).persist()
    def codes(v: org.apache.spark.sql.DataFrame) =
      Pq.encodeResidual(Ivf.index(v, cents), cents, cb, dim = 64, m = 8)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val a = codes(emb)
    val b = codes(emb.repartition(7))
    assert(a.nonEmpty && a === b)
    idx.unpersist(); cb.unpersist()
    graft.operators.Dedup.releaseCaches(spark)
  }
}
