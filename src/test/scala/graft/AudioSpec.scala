package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Audio
import graft.tables.Tables

/** The real javax.sound.sampled decode arm: codec round trip across all
  * three containers (WAVE little-endian, AU/AIFF big-endian — samples
  * are the invariant, not container bytes), header/decode consistency,
  * fingerprint kernel semantics, and the shared-banding losslessness
  * the t_audio_dedup oracle certifies cross-engine. */
class AudioSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  /** Independent per-sample reference for the fingerprint (the oracle's
    * formulation transcribed, kept separate from the kernel's
    * single-pass form). */
  private def refFinger(s: Array[Int]): Long = {
    val n = s.length
    val be = new Array[Long](64)
    val bl = new Array[Long](64)
    var total = 0L
    for (i <- 0 until n) {
      val k = (i.toLong * 64 / n).toInt
      val e = s(i).toLong * s(i)
      be(k) += e; bl(k) += 1; total += e
    }
    (0 until 64).filter(k => be(k) * n > total * bl(k))
      .map(1L << _).foldLeft(0L)(_ | _)
  }

  test("encode -> decode is sample-exact in ALL THREE containers; header matches decode") {
    // spans group bases (v = 0), perturbed variants (v > 0), both
    // parity classes of the perturbation cycle (v % 7 == 0 → exact
    // dup), and all three containers (doc_id % 3)
    for (docId <- Seq(0L, 1L, 2L, 3L, 199L, 200L, 417L, 1400L, 4999L)) {
      val (rate, s) = Audio.synthSamples(docId)
      val container = Audio.containerOf(docId)
      val bytes = Audio.encode(rate, s, container)
      val (hfmt, hrate, hbits, hch, hframes) = Audio.decodeHeader(bytes)
      assert(hfmt ===
        container.toString.toLowerCase(java.util.Locale.ROOT),
        s"container name mismatch for doc $docId")
      assert((hrate, hbits, hch, hframes) === ((rate, 16, 1, s.length.toLong)),
        s"header mismatch for doc $docId")
      val d = Audio.decode(bytes)
      assert(d.container === hfmt && d.rate === rate)
      assert(d.samples.toSeq === s.toSeq,
        s"codec round trip not sample-exact for doc $docId ($hfmt)")
      assert(Audio.aFinger64(d.samples) === refFinger(s),
        s"fingerprint kernel != reference for doc $docId")
    }
  }

  test("AU/AIFF store big-endian, WAVE little-endian — decode honors the declared layout") {
    val (rate, s) = Audio.synthSamples(7L)
    val byContainer = Seq(
      javax.sound.sampled.AudioFileFormat.Type.WAVE -> false,
      javax.sound.sampled.AudioFileFormat.Type.AU -> true,
      javax.sound.sampled.AudioFileFormat.Type.AIFF -> true)
    for ((c, expectBig) <- byContainer) {
      val bytes = Audio.encode(rate, s, c)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try assert(ais.getFormat.isBigEndian === expectBig,
        s"$c endianness changed — decode's parser assumption broke")
      finally ais.close()
      // and the samples still round-trip despite the layout difference
      assert(Audio.decode(bytes).samples.toSeq === s.toSeq)
    }
  }

  test("corrupt bytes fail LOUD at decode AND header, not as a silent wrong hash") {
    val junk = "definitely not audio".getBytes("UTF-8")
    val e1 = intercept[IllegalArgumentException] { Audio.decode(junk) }
    assert(e1.getMessage.contains("no audio reader"))
    val e2 = intercept[IllegalArgumentException] { Audio.decodeHeader(junk) }
    assert(e2.getMessage.contains("no audio reader"))
  }

  test("audioStats over the synthesized corpus: rates, containers, integer stats, near-dup hashes") {
    val stats = Audio.audioStats(spark,
      Audio.synthesize(spark, Tables.documents(spark, dir))).persist()
    try {
      val rows = stats.collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getInt(5), r.getInt(6), r.getLong(7), r.getLong(8), r.getLong(9)))).toMap
      assert(rows.size === 500)
      rows.foreach { case (id, (fmt, rate, n, sum, mn, mx, energy, zcr, _)) =>
        val g = id % 200
        assert(fmt === Audio.containerOf(id).toString
          .toLowerCase(java.util.Locale.ROOT))
        assert(rate === Audio.sampleRateOf(g))
        assert(n === 256L * (1 + (g % 8)))
        assert(mn >= -32768 && mx <= 32767 && mn <= mx)
        assert(sum >= n * mn && sum <= n * mx)
        assert(energy > 0L)
        assert(zcr >= 0L && zcr < n)
        // ZCR recomputed from the fixture formula (sign changes over
        // adjacent samples; 0 is non-negative)
        val s = Audio.synthSamples(id)._2
        val ref = (1 until s.length).count(i => (s(i) < 0) != (s(i - 1) < 0))
        assert(zcr === ref.toLong, s"zero_cross != reference for doc $id")
      }
      // the format column carries live multi-container signal
      assert(rows.values.map(_._1).toSet === Set("wave", "au", "aiff"))
      // 1-sample perturbation stays within hamming 3 of the group base
      val h0 = rows(5L)._9
      val h1 = rows(205L)._9 // same g = 5, v = 1
      assert(java.lang.Long.bitCount(h0 ^ h1) <= 3,
        "1-sample perturbation must stay within hamming 3")
      // header-only pass agrees with the full decode on every doc
      val metaRows = Audio.audioMeta(spark,
        Audio.synthesize(spark, Tables.documents(spark, dir)))
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
      rows.foreach { case (id, (fmt, rate, n, _, _, _, _, _, _)) =>
        assert(metaRows(id) === ((fmt, rate, 16, 1, n)))
      }
    } finally { stats.unpersist(blocking = false); () }
  }

  test("banded near-dup join is LOSSLESS vs brute-force hamming <= 3; cap refused above 3") {
    val stats = Audio.audioStats(spark,
      Audio.synthesize(spark, Tables.documents(spark, dir)))
      .select(col("doc_id"), col("afp")).persist()
    try {
      val banded = Audio.nearDupPairs(stats, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val hs = stats.collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = (for {
        (a, ha) <- hs; (b, hb) <- hs if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (a, b, d.toLong)).toSet
      assert(banded === brute,
        s"banding lost ${(brute -- banded).size} pairs / invented ${(banded -- brute).size}")
      assert(brute.nonEmpty, "fixture must produce live near-dup pairs")
      // live INEXACT near-dups too (hamming in 1..3), or the banding
      // join is only ever exercised by identical hashes
      assert(brute.exists(_._3 > 0L), "no inexact near-dup pairs")
      // pairs are same-group by construction (zero cross-group noise)
      assert(brute.forall { case (a, b, _) => a % 200 == b % 200 })
      val e = intercept[IllegalArgumentException] {
        Audio.nearDupPairs(stats, maxHamming = 4)
      }
      assert(e.getMessage.contains("recall-lossless"))
      val plan = Audio.nearDupPairs(stats).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"banded join degenerated to a product:\n$plan")
    } finally { stats.unpersist(blocking = false); () }
  }

  test("nearDupKeepers == the pair form's drop-doc_b decision, without emitting pairs") {
    val stats = Audio.audioStats(spark,
      Audio.synthesize(spark, Tables.documents(spark, dir)))
      .select(col("doc_id"), col("afp")).persist()
    try {
      val keepers = Audio.nearDupKeepers(stats)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(keepers.size === 500, "one keep/drop row per input doc")
      val losers = Audio.nearDupPairs(stats)
        .select(col("doc_b")).distinct().collect().map(_.getLong(0)).toSet
      val keptWant = (0L until 500L).toSet -- losers
      val keptGot = keepers.filter(_._2).keySet
      assert(keptGot === keptWant,
        s"keepers diverge from pair drop-doc_b: extra=${keptGot -- keptWant} " +
          s"missing=${keptWant -- keptGot}")
      assert(losers.nonEmpty && keptGot.nonEmpty)
    } finally { stats.unpersist(blocking = false); () }
  }

  test("audioQuality: clipping / silence counts and longest run match a driver reference") {
    val q = Audio.audioQuality(spark,
      Audio.synthesize(spark, Tables.documents(spark, dir)))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(q.size === 500)
    var liveClip = false
    var liveSilence = false
    for (id <- 0L until 500L) {
      val s = Audio.synthSamples(id)._2
      val clipped = s.count(v => math.abs(v.toLong) >= 32700).toLong
      val silent = s.count(v => math.abs(v.toLong) < 256).toLong
      var run = 0L; var longest = 0L
      s.foreach { v =>
        if (math.abs(v.toLong) < 256) { run += 1; if (run > longest) longest = run }
        else run = 0
      }
      assert(q(id) === ((s.length.toLong, clipped, silent, longest)),
        s"quality fields != reference for doc $id")
      if (clipped > 0) liveClip = true
      if (silent > 0) liveSilence = true
    }
    assert(liveClip && liveSilence, "fixture must exercise both gates")
    assert(intercept[IllegalArgumentException] {
      Audio.audioQuality(spark,
        Audio.synthesize(spark, Tables.documents(spark, dir)), clipLevel = 0)
    }.getMessage.contains("positive"))
  }

  test("resample(4): every output sample is an exact input sample; WAVE at rate/4") {
    val resampled = Audio.resample(spark,
      Audio.synthesize(spark, Tables.documents(spark, dir)), factor = 4)
    val rows = resampled.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(rows.length === 500)
    for ((id, bytes) <- rows.take(20) ++ rows.takeRight(5)) {
      val d = Audio.decode(bytes)
      val (rate, orig) = Audio.synthSamples(id)
      assert(d.container === "wave" && d.rate === rate / 4)
      val want = orig.indices.collect { case i if i % 4 == 0 => orig(i) }
      assert(d.samples.toSeq === want,
        s"decimated samples != every-4th original for doc $id")
    }
    assert(intercept[IllegalArgumentException] {
      Audio.resample(spark,
        Audio.synthesize(spark, Tables.documents(spark, dir)), factor = 0)
    }.getMessage.contains("positive"))
  }

  test("a caller-persisted hash frame is honored (no double-persist error, no double-release)") {
    // the ADVICE r12 hazard: Fingerprints used to persist
    // unconditionally, so an already-persisted input (the streaming
    // sink's pattern) relied on matching storage levels and was
    // unpersisted twice
    val stats = Audio.audioStats(spark,
      Audio.synthesize(spark, Tables.documents(spark, dir)))
      .select(col("doc_id"), col("afp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      // non-default storage level: an unconditional .persist() inside
      // would throw "cannot change storage level"
      assert(Audio.nearDupPairs(stats).count() > 0)
      assert(Audio.nearDupKeepers(stats).count() === 500)
      // still persisted at the caller's level — the operators did not
      // release a frame they do not own
      assert(stats.storageLevel ===
        org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    } finally { stats.unpersist(blocking = false); () }
  }
}
