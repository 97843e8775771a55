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
      assert(math.abs(dec - exp) < 8L * w * h,
        s"frame $f mean drifted beyond the JPEG bound: dec=$dec exp=$exp")
    }
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
}
