package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Video
import graft.tables.Tables

/** The round-13 video arm: RIFF/AVI writer↔parser round trip, REAL
  * MJPEG frame decode through the JDK JPEG codec, loud corruption
  * failures at every cross-checked layer, and decode-only-sampled
  * frame access. */
class VideoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  private def fixture(docId: Long): Array[Byte] = {
    val (w, h, n, fps) = Video.synthParams(docId)
    Video.encodeAvi(w, h, fps,
      (0 until n).map(f => {
        val px = Video.synthFramePixels(docId, f)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val p = px(y * w + x)
          img.setRGB(x, y, (p << 16) | (p << 8) | p)
        }
        val bos = new java.io.ByteArrayOutputStream()
        assert(javax.imageio.ImageIO.write(img, "jpg", bos))
        bos.toByteArray
      }))
  }

  test("AVI writer -> parser round trip: every header field and frame offset") {
    for (docId <- Seq(0L, 3L, 57L, 199L, 200L, 417L)) {
      val (w, h, n, fps) = Video.synthParams(docId)
      val bytes = fixture(docId)
      val m = Video.parseMeta(bytes)
      assert((m.width, m.height, m.totalFrames) === ((w, h, n.toLong)))
      assert(m.usPerFrame === 1000000L / fps && m.rate === fps.toLong &&
        m.scale === 1L && m.handler === "mjpg" && m.streams === 1L)
      assert(m.frameOffsets.size === n)
      // each indexed slice starts with the JPEG SOI marker
      m.frameOffsets.foreach { case (off, len) =>
        assert(len > 2 && (bytes(off) & 0xff) === 0xff &&
          (bytes(off + 1) & 0xff) === 0xd8, "frame slice is not a JPEG")
      }
    }
  }

  test("REAL frame decode: exact dims, mean luminance within the JPEG tolerance") {
    val docId = 42L
    val (w, h, n, _) = Video.synthParams(docId)
    val bytes = fixture(docId)
    val m = Video.parseMeta(bytes)
    for (f <- 0 until n) {
      val gray = Video.decodeFrame(bytes, m, f)
      assert(gray.length === w * h)
      val dec = gray.map(_.toLong).sum
      val exp = Video.synthFrameSum(docId, f)
      // gate 1 gray level: measured max deviation is 0.504 across 3 SFs
      // (JpegBoundProbe) — the DC coefficient carries the block mean
      assert(math.abs(dec - exp) < 1L * w * h,
        s"frame $f mean drifted beyond the JPEG bound: dec=$dec exp=$exp")
    }
  }

  test("uncompressed DIB arm: encode -> parse -> decode is BIT-exact, no codec") {
    for (docId <- Seq(0L, 42L, 199L, 301L)) {
      val (w, h, n, fps) = Video.synthParams(docId)
      val bytes = Video.encodeAviRaw(w, h, fps,
        (0 until n).map(f => Video.synthFramePixels(docId, f)))
      val m = Video.parseMeta(bytes)
      assert((m.width, m.height, m.totalFrames, m.handler) ===
        ((w, h, n.toLong, "dib ")))
      for (f <- 0 until n)
        assert(Video.decodeFrame(bytes, m, f) === Video.synthFramePixels(docId, f),
          s"doc $docId frame $f raw decode is not bit-exact")
    }
    // the DIB chunk-length cross-check fails loud on a truncated frame
    val (w, h, n, fps) = Video.synthParams(0L)
    val good = Video.encodeAviRaw(w, h, fps,
      (0 until n).map(f => Video.synthFramePixels(0L, f)))
    val m = Video.parseMeta(good)
    val truncated = java.util.Arrays.copyOf(good, good.length)
    // shrink the first 00db chunk's declared length by one row
    val (off, _) = m.frameOffsets(0)
    val lenField = off - 4
    val stride = Video.dibStride(w)
    val badLen = stride.toLong * (h - 1)
    truncated(lenField) = (badLen & 0xff).toByte
    truncated(lenField + 1) = ((badLen >> 8) & 0xff).toByte
    truncated(lenField + 2) = ((badLen >> 16) & 0xff).toByte
    truncated(lenField + 3) = ((badLen >> 24) & 0xff).toByte
    // the shrunk chunk desyncs the movi walk -> count cross-check fires
    // (or, if counts happen to align, the per-frame stride check does)
    val e = intercept[IllegalArgumentException] {
      val m2 = Video.parseMeta(truncated)
      Video.decodeFrame(truncated, m2, 0)
    }
    assert(e.getMessage.contains("disagree") || e.getMessage.contains("DIB") ||
      e.getMessage.contains("overruns"), e.getMessage)
  }

  test("corruption fails LOUD at every cross-checked layer") {
    val good = fixture(7L)
    // not RIFF at all
    val e1 = intercept[IllegalArgumentException] {
      Video.parseMeta("definitely not a video".getBytes("US-ASCII"))
    }
    assert(e1.getMessage.contains("RIFF"))
    // wrong form type
    val wrongForm = good.clone()
    wrongForm(8) = 'W'; wrongForm(9) = 'A'; wrongForm(10) = 'V'; wrongForm(11) = 'E'
    assert(intercept[IllegalArgumentException] {
      Video.parseMeta(wrongForm)
    }.getMessage.contains("AVI"))
    // a non-MJPG stream handler refuses (inter-frame codecs are stubbed)
    val h264 = good.clone()
    val strhHandler = indexOf(h264, "MJPG".getBytes("US-ASCII"))
    assert(strhHandler > 0)
    "h264".getBytes("US-ASCII").copyToArray(h264, strhHandler)
    assert(intercept[IllegalArgumentException] {
      Video.parseMeta(h264)
    }.getMessage.contains("MJPG"))
    // frame-count disagreement between avih and the movi chunks
    val badCount = good.clone()
    val avih = indexOf(badCount, "avih".getBytes("US-ASCII"))
    badCount(avih + 8 + 16) = 99.toByte // dwTotalFrames low byte
    assert(intercept[IllegalArgumentException] {
      Video.parseMeta(badCount)
    }.getMessage.contains("disagree"))
  }

  test("fuzz: parseMeta is TOTAL on mutated bytes — parses or IAEs, never hangs or crashes otherwise") {
    // deterministic-seed fuzz over all three container flavors (MJPEG,
    // raw DIB, three-stream A/V/T): random byte mutations must either
    // still parse (mutation hit a payload byte the walker never
    // interprets) or fail with the walker's own IllegalArgumentException
    // — any OTHER exception is an unguarded read, and a hang is the
    // pre-round-14 truncation bug class. 6000 mutated parses run in
    // well under the suite budget because every loop provably advances.
    val (w, h, n, fps) = Video.synthParams(7L)
    val corpora = Seq(
      fixture(7L),
      Video.encodeAviRaw(w, h, fps,
        (0 until n).map(f => Video.synthFramePixels(7L, f))),
      Video.encodeAvi(w, h, fps,
        (0 until n).map(f => {
          val px = Video.synthFramePixels(7L, f)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until h; x <- 0 until w) {
            val p = px(y * w + x); img.setRGB(x, y, (p << 16) | (p << 8) | p)
          }
          val bos = new java.io.ByteArrayOutputStream()
          assert(javax.imageio.ImageIO.write(img, "jpg", bos))
          bos.toByteArray
        }),
        audio = Some(graft.operators.Audio.synthSamples(7L)),
        subtitles = Some((0 until n).map(f => Video.synthCaption(7L, f)))))
    val rnd = new scala.util.Random(42)
    var parsed = 0
    var rejected = 0
    for (base <- corpora; _ <- 1 to 2000) {
      val mutated = base.clone()
      val nMut = 1 + rnd.nextInt(8)
      for (_ <- 1 to nMut)
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try { Video.parseMeta(mutated); parsed += 1 }
      catch {
        case _: IllegalArgumentException => rejected += 1
        case e: Throwable =>
          fail(s"parseMeta leaked a ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // both outcomes must actually occur or the fuzz is vacuous
    assert(parsed > 0 && rejected > 0, s"parsed=$parsed rejected=$rejected")
  }

  test("u32 chunk lengths never truncate: crafted huge lengths fail loud, never hang") {
    // a declared chunk length in the u32 top half used to truncate to a
    // negative Int, slip past the overrun check and stall the walker in
    // an infinite loop — corrupt scrape bytes must fail in bounded time
    val good = fixture(7L)
    val hugeOuter = good.clone()
    val avih = indexOf(hugeOuter, "avih".getBytes("US-ASCII"))
    // avih's length field: declare 0xFFFFFFF0 (negative as Int)
    hugeOuter(avih + 4) = 0xf0.toByte; hugeOuter(avih + 5) = 0xff.toByte
    hugeOuter(avih + 6) = 0xff.toByte; hugeOuter(avih + 7) = 0xff.toByte
    assert(intercept[IllegalArgumentException] {
      Video.parseMeta(hugeOuter)
    }.getMessage.contains("overruns"))
    // same attack inside the movi loop (the '00dc' frame chunk length)
    val hugeMovi = good.clone()
    val dc = indexOf(hugeMovi, "00dc".getBytes("US-ASCII"))
    hugeMovi(dc + 4) = 0xf0.toByte; hugeMovi(dc + 5) = 0xff.toByte
    hugeMovi(dc + 6) = 0xff.toByte; hugeMovi(dc + 7) = 0xff.toByte
    assert(intercept[IllegalArgumentException] {
      Video.parseMeta(hugeMovi)
    }.getMessage.contains("overruns the movi list"))
  }

  test("a second (audio) stream is walked past, not rejected") {
    // real-world AVIs routinely carry an 'auds' strl after the video
    // one; the movi indexer only consumes stream-0 00dc/00db chunks, so
    // the parser must skip extra streams (and still fail loud when
    // STREAM 0 is not MJPEG video — pinned in the corruption test)
    def u32le(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val strlPayload = fcc("strl") ++
      fcc("strh") ++ u32le(56) ++ fcc("auds") ++ fcc("mp3 ") ++
      Array.fill[Byte](48)(0) ++
      fcc("strf") ++ u32le(16) ++ Array.fill[Byte](16)(0)
    val audsList = fcc("LIST") ++ u32le(strlPayload.length.toLong) ++ strlPayload
    val good = fixture(7L)
    val rd = (o: Int) => ((good(o) & 0xffL)) | ((good(o + 1) & 0xffL) << 8) |
      ((good(o + 2) & 0xffL) << 16) | ((good(o + 3) & 0xffL) << 24)
    val hdrlEnd = 20 + rd(16).toInt // hdrl LIST payload spans [20, 20+size)
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, hdrlEnd)
    out.write(audsList, 0, audsList.length)
    out.write(good, hdrlEnd, good.length - hdrlEnd)
    val bytes = out.toByteArray
    def patch32(o: Int, v: Long): Unit = u32le(v).copyToArray(bytes, o)
    patch32(4, rd(4) + audsList.length)   // RIFF size
    patch32(16, rd(16) + audsList.length) // hdrl LIST size
    bytes(24 + 8 + 24) = 2                // avih dwStreams = 2
    val m = Video.parseMeta(bytes)
    val (w, h, n, fps) = Video.synthParams(7L)
    assert((m.width, m.height, m.totalFrames, m.streams) ===
      ((w, h, n.toLong, 2L)))
    assert(m.handler === "mjpg" && m.rate === fps.toLong)
    // frames still index and decode
    assert(Video.decodeFrame(bytes, m, 0).length === w * h)
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  test("videoMeta over the synthesized corpus matches the fixture formula") {
    val rows = Video.videoMeta(spark,
      Video.synthesize(spark, Tables.documents(spark, dir)))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(6)))).toMap
    assert(rows.size === 500)
    rows.foreach { case (id, (w, h, nf, us, fps, fmt)) =>
      val (ew, eh, en, efps) = Video.synthParams(id)
      assert((w, h, nf, fps, fmt) === ((ew, eh, en.toLong, efps.toLong, "mjpg")))
      assert(us === 1000000L / efps)
    }
    // the fixture spans multiple frame rates and dims (live signal)
    assert(rows.values.map(_._5).toSet.size >= 4)
    assert(rows.values.map(v => (v._1, v._2)).toSet.size > 4)
  }

  test("keyframe hashes: equal within byte-identical groups, keepers = group minima") {
    val vids = Video.synthesize(spark, Tables.documents(spark, dir)).persist()
    try {
      val hashes = Video.keyframeHashes(spark, vids)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(hashes.length === 500)
      // same-group videos are byte-identical -> equal keyframe hashes;
      // and the fixture's 200 patterns hash distinctly (a collision
      // would also break the catalog oracle)
      val byGroup = hashes.groupBy(_._1 % 200).view.mapValues(_.map(_._2).toSet)
      byGroup.foreach { case (g, hs) =>
        assert(hs.size === 1, s"group $g keyframe hashes diverged: $hs")
      }
      assert(byGroup.values.map(_.head).toSet.size === 200,
        "cross-group keyframe hash collision")
      val keepers = Video.nearDupKeepers(spark, vids)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      graft.pipeline.Curate.releaseCaches(spark)
      assert(keepers.size === 500)
      keepers.foreach { case (id, keep) =>
        assert(keep === (id == id % 200), s"doc $id keeper decision wrong")
      }
    } finally { vids.unpersist(blocking = false); () }
  }

  test("A/V mux -> demux: audio samples bit-exact, video stream untouched") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).limit(60)
    val av = graft.operators.Video.synthesizeAV(spark, docs).persist()
    try {
      // the demuxed track decodes to EXACTLY the audio-arm fixture
      val tracks = graft.operators.Video.extractAudioTrack(spark, av)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(tracks.size === 60)
      for ((id, wav) <- tracks) {
        val d = graft.operators.Audio.decode(wav)
        val (rate, want) = graft.operators.Audio.synthSamples(id)
        assert(d.rate === rate, s"doc $id demuxed rate drifted")
        assert(d.samples === want, s"doc $id demuxed samples not bit-exact")
      }
      // the video stream decodes exactly as in the audio-less container
      val frames = graft.operators.Video.frameTable(spark, av)
        .select("doc_id", "frame_idx").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val want = docs.select("doc_id").as[Long].collect().flatMap { id =>
        (0 until graft.operators.Video.synthParams(id)._3).map(f => (id, f))
      }.toSet
      assert(frames === want, "frame index disturbed by interleaved audio chunks")
      // two streams reported; keyframe hashes unaffected
      val m = graft.operators.Video.videoMeta(spark, av)
        .select("doc_id", "n_streams").collect()
      assert(m.forall(_.getLong(1) === 2L))
    } finally { av.unpersist(blocking = false); () }
    // loud on a container WITHOUT an audio track
    val plain = Seq((1L, fixture(7L))).toDF("doc_id", "video")
    val e = intercept[org.apache.spark.SparkException] {
      graft.operators.Video.extractAudioTrack(spark, plain).collect()
    }
    assert(e.getCause.getMessage.contains("no audio track"))
  }

  test("three-stream container: captions round-trip UTF-8 exact alongside audio and video") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).limit(40)
    val avt = graft.operators.Video.synthesizeAVT(spark, docs).persist()
    try {
      val caps = graft.operators.Video.extractSubtitles(spark, avt)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
      val nFrames = (0L until 40L).map(id =>
        id -> graft.operators.Video.synthParams(id)._3).toMap
      assert(caps.size === nFrames.values.sum)
      caps.foreach { case ((id, f), text) =>
        assert(text === graft.operators.Video.synthCaption(id, f),
          s"doc $id caption $f drifted")
      }
      // the other two streams are untouched by the third
      val tracks = graft.operators.Video.extractAudioTrack(spark, avt)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      for ((id, wav) <- tracks)
        assert(graft.operators.Audio.decode(wav).samples ===
          graft.operators.Audio.synthSamples(id)._2)
      val frames = graft.operators.Video.frameTable(spark, avt).count()
      assert(frames === nFrames.values.sum.toLong)
      val m = graft.operators.Video.videoMeta(spark, avt)
        .select("n_streams").collect()
      assert(m.forall(_.getLong(0) === 3L))
    } finally { avt.unpersist(blocking = false); () }
    // loud when no text track exists
    val plain = Seq((1L, fixture(7L))).toDF("doc_id", "video")
    val e = intercept[org.apache.spark.SparkException] {
      graft.operators.Video.extractSubtitles(spark, plain).collect()
    }
    assert(e.getCause.getMessage.contains("no text track"))
  }

  test("scene cuts: exact shot boundaries, measured cross-cut hamming floor") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val scenes = graft.operators.Video.synthesizeScenes(spark, docs).persist()
    try {
      val cuts = graft.operators.Video.sceneCuts(spark, scenes)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      // expected cuts: every shot boundary k*shotLen, k = 1..nShots-1
      val want = docs.select("doc_id").as[Long].collect().flatMap { id =>
        val (shotLen, nShots) = graft.operators.Video.synthSceneParams(id)
        (1 until nShots).map(k => (id, k * shotLen))
      }.toSet
      assert(cuts.map(c => (c._1, c._2)).toSet === want,
        "cut set != shot boundaries")
      // the threshold lives on the hamming gap: inside a shot it is 0 by
      // construction (identical frames); ACROSS cuts, measure the floor
      // before trusting maxHamming = 0 — a 1-bit floor would be fragile
      val floor = cuts.map(_._3).min
      assert(floor >= 8, s"cross-cut hamming floor $floor is too fragile")
      // shot table recomposes cuts into (start, length) runs
      val shots = graft.operators.Video.shotTable(spark, scenes)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      shots.foreach { case (id, si, start, n) =>
        val (shotLen, _) = graft.operators.Video.synthSceneParams(id)
        assert(start === si * shotLen && n === shotLen,
          s"doc $id shot $si: ($start, $n) != (${si * shotLen}, $shotLen)")
      }
      val byDoc = shots.groupBy(_._1)
      docs.select("doc_id").as[Long].collect().foreach { id =>
        assert(byDoc(id).length === graft.operators.Video.synthSceneParams(id)._2)
      }
    } finally { scenes.unpersist(blocking = false); () }
  }

  test("sampleFrames decodes only sampled indices, with exact pts") {
    val vids = Video.synthesize(spark, Tables.documents(spark, dir)).persist()
    try {
      val all = Video.frameTable(spark, vids)
        .select("doc_id", "frame_idx").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val sampled = Video.sampleFrames(spark, vids, stride = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(sampled.map(t => (t._1, t._2)) ===
        all.filter(_._2 % 2 == 0), "sampled set != every-2nd-frame set")
      sampled.foreach { case (id, f, pts) =>
        val fps = Video.synthParams(id)._4
        assert(pts === f * (1000000L / fps))
      }
      // stride must be positive
      assert(intercept[IllegalArgumentException] {
        Video.sampleFrames(spark, vids, stride = 0)
      }.getMessage.contains("positive"))
    } finally { vids.unpersist(blocking = false); () }
  }

  test("edge shapes: huge strides/intervals keep only frame 0; single-shot clips cut nowhere; empty captions round-trip") {
    import spark.implicits._
    val one = Seq((5L, fixture(5L))).toDF("doc_id", "video")
    // stride far beyond the clip length -> exactly frame 0 survives
    val strided = Video.sampleFrames(spark, one, stride = 1000).collect()
    assert(strided.length === 1 && strided(0).getInt(1) === 0)
    val exported = Video.exportFrames(spark, one, stride = 1000).collect()
    assert(exported.length === 1 && exported(0).getInt(1) === 0)
    // a sampling interval longer than the whole clip -> only frame 0
    val timed = Video.sampleFramesEvery(spark, one, everyUs = 3600L * 1000000L)
      .collect()
    assert(timed.length === 1 && timed(0).getInt(1) === 0)
    // a clip whose frames are ALL identical (one shot) has zero cuts,
    // on the MJPEG arm too (byte-identical JPEG chunks decode equal)
    val (w, h, _, fps) = Video.synthParams(5L)
    val oneJpeg = {
      val px = Video.synthFramePixels(5L, 0)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val p = px(y * w + x); img.setRGB(x, y, (p << 16) | (p << 8) | p)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    val flatClip = Seq((9L, Video.encodeAvi(w, h, fps, Seq.fill(4)(oneJpeg))))
      .toDF("doc_id", "video")
    assert(Video.sceneCuts(spark, flatClip).count() === 0L)
    val shots = Video.shotTable(spark, flatClip).collect()
    assert(shots.length === 1 &&
      (shots(0).getInt(1), shots(0).getInt(2), shots(0).getInt(3)) === ((0, 0, 4)))
    // empty captions are legal zero-length text chunks and round-trip
    val capped = Seq((3L, Video.encodeAvi(w, h, fps, Seq.fill(3)(oneJpeg),
      subtitles = Some(Seq("", "середина 中", ""))))).toDF("doc_id", "video")
    val caps = Video.extractSubtitles(spark, capped)
      .collect().map(r => r.getInt(1) -> r.getString(2)).toMap
    assert(caps === Map(0 -> "", 1 -> "середина 中", 2 -> ""))
  }

  test("sampleFramesEvery keeps one frame per pts bucket across mixed frame rates") {
    val vids = Video.synthesize(spark, Tables.documents(spark, dir).limit(100))
      .persist()
    try {
      val everyUs = 100000L
      val got = Video.sampleFramesEvery(spark, vids, everyUs)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val want = (0L until 100L).flatMap { id =>
        val (_, _, n, fps) = Video.synthParams(id)
        val uspf = 1000000L / fps
        (0 until n).filter(f => f == 0 ||
          f * uspf / everyUs != (f - 1) * uspf / everyUs)
          .map(f => (id, f, f * uspf))
      }.toSet
      assert(got === want, "time-sampled set != pts-bucket formula")
      // mixed rates produce LIVE signal: some clips keep all frames,
      // some skip (30 fps keeps every 3rd at 100 ms)
      val keptPerDoc = got.groupBy(_._1).view.mapValues(_.size).toMap
      val fullPerDoc = (0L until 100L).map(id => id -> Video.synthParams(id)._3).toMap
      assert(keptPerDoc.exists { case (id, k) => k < fullPerDoc(id) })
      assert(keptPerDoc.exists { case (id, k) => k == fullPerDoc(id) })
      assert(intercept[IllegalArgumentException] {
        Video.sampleFramesEvery(spark, vids, 0L)
      }.getMessage.contains("positive"))
    } finally { vids.unpersist(blocking = false); () }
  }
}
