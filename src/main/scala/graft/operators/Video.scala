package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL video arm of the multimodal layer (round 13): the "no JDK video
  * codec" stub premise is PARTIALLY refutable — container METADATA and
  * MJPEG frame decode need nothing beyond what this JDK ships.
  *
  *   - The AVI container is RIFF, a public byte-level spec: parsing the
  *     header (dims, frame count, frame rate, stream handler) is plain
  *     binary walking, no codec involved. [[parseMeta]] is that walker;
  *     [[encodeAvi]] is the matching writer the fixture uses.
  *   - MJPEG ("MJPG" handler) stores each frame as an ordinary JPEG in
  *     a '00dc' movi chunk — and ImageIO is a real JPEG codec. So
  *     [[frameTable]]/[[sampleFrames]] do REAL video frame decode:
  *     split the movi list, hand each chunk to the JDK's JPEG reader.
  *
  * What stays honestly stubbed (in [[Multimodal]]): inter-frame codecs
  * (H.264/VP9/AV1...) — nothing in this JDK decodes them, re-verified
  * each round. Honesty note on certification strength: for images and
  * audio the ENCODER and DECODER are both the JDK's, so the oracle
  * certifies a third-party codec round trip; here the container
  * writer/parser pair is ours on both sides (the JPEG frame codec is
  * still the JDK's). The operator therefore cross-checks every layer
  * against the others — avih dims vs strf dims vs DECODED JPEG dims,
  * avih totalFrames vs strh length vs the actual movi chunk count —
  * and fails LOUD on any disagreement, so a hash match certifies the
  * full chain's mutual consistency plus the JPEG decode tolerance
  * bound (JPEG is lossy; pixel stats ride the self-validating `ok`
  * bound, the a5_approx_uv pattern, with the frame MEAN preserved to
  * well under the ±8 gate by JPEG's DC coefficient).
  *
  * Scale: synthesis/decode are map-side per video (one row in, one
  * video's frames out — [[frameTable]] is a flatMap); no shuffle
  * anywhere. Frame sampling decodes ONLY the sampled frames (the
  * parser slices chunk bytes without touching the JPEG payloads),
  * which is the property a 100 TB frame-sampling pass lives on.
  */
object Video {

  private lazy val init: Unit = {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  // ---- fixture ----------------------------------------------------------

  /** Deterministic per-doc MJPEG/AVI fixture parameters — pure integer
    * arithmetic over doc_id, reproducible in SQL: group g = doc_id %
    * 200 picks dims, frame count and fps (all small — frames are real
    * JPEG encodes). */
  private[graft] def synthParams(docId: Long): (Int, Int, Int, Int) = {
    val g = docId % 200
    val w = (16 * (1 + (g % 4))).toInt
    val h = (16 * (1 + ((g / 4) % 3))).toInt
    val nFrames = (2 + (g % 5)).toInt
    val fps = ((g / 12) % 5) match {
      case 0 => 10; case 1 => 15; case 2 => 24; case 3 => 25; case _ => 30
    }
    (w, h, nFrames, fps)
  }

  /** Grayscale frame pixels — the image-arm multiplicative mix with the
    * frame index folded in nonlinearly, so frames differ within a clip
    * and clips differ across groups. All terms positive (Java % == SQL
    * %). */
  private[graft] def synthFramePixels(docId: Long, frame: Int): Array[Int] = {
    val g = docId % 200
    val (w, h, _, _) = synthParams(docId)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = ((x * 2654435761L + y * 40503L +
          (x + 3L) * (y + 7L) * (g + 13L) + frame * 7919L * (x + y + 1L) +
          g * 2246822519L) % 256L).toInt
        x += 1
      }
      y += 1
    }
    px
  }

  /** Exact integer luminance sum of a formula frame — the engine-side
    * twin of the oracle's per-pixel recomputation, used for the
    * self-validating JPEG tolerance bound. */
  private[graft] def synthFrameSum(docId: Long, frame: Int): Long = {
    val px = synthFramePixels(docId, frame)
    var s = 0L
    var i = 0
    while (i < px.length) { s += px(i); i += 1 }
    s
  }

  private def jpegEncode(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    init
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "jpg", bos), "no JPEG writer")
    bos.toByteArray
  }

  // ---- RIFF/AVI writer --------------------------------------------------

  private def u32(b: ByteArrayOutputStream, v: Long): Unit = {
    b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
    b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
  }
  private def u16(b: ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def fcc(b: ByteArrayOutputStream, s: String): Unit = {
    require(s.length == 4); var i = 0
    while (i < 4) { b.write(s.charAt(i).toInt & 0xff); i += 1 }
  }

  /** Assemble an MJPEG AVI from pre-encoded JPEG frames — the standard
    * RIFF layout (avih + one 'vids'/'MJPG' stream + movi '00dc'
    * chunks, 2-byte chunk alignment). usPerFrame = 1,000,000 / fps
    * (integer division — the oracle reproduces it). */
  private[graft] def encodeAvi(w: Int, h: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty)
    val maxFrame = frames.map(_.length).max
    // movi body
    val movi = new ByteArrayOutputStream()
    fcc(movi, "movi")
    frames.foreach { f =>
      fcc(movi, "00dc"); u32(movi, f.length.toLong)
      movi.write(f, 0, f.length)
      if (f.length % 2 == 1) movi.write(0) // RIFF chunks align to 2 bytes
    }
    val hdrl = new ByteArrayOutputStream()
    fcc(hdrl, "hdrl")
    // avih (56 bytes)
    fcc(hdrl, "avih"); u32(hdrl, 56)
    u32(hdrl, 1000000L / fps) // dwMicroSecPerFrame
    u32(hdrl, 0); u32(hdrl, 0); u32(hdrl, 0) // maxBytesPerSec, padding, flags
    u32(hdrl, frames.size.toLong) // dwTotalFrames
    u32(hdrl, 0); u32(hdrl, 1) // initialFrames, dwStreams
    u32(hdrl, maxFrame.toLong) // suggestedBufferSize
    u32(hdrl, w.toLong); u32(hdrl, h.toLong)
    u32(hdrl, 0); u32(hdrl, 0); u32(hdrl, 0); u32(hdrl, 0) // reserved
    // strl list: strh (56) + strf (40, BITMAPINFOHEADER)
    val strl = new ByteArrayOutputStream()
    fcc(strl, "strl")
    fcc(strl, "strh"); u32(strl, 56)
    fcc(strl, "vids"); fcc(strl, "MJPG")
    u32(strl, 0); u16(strl, 0); u16(strl, 0) // flags, priority, language
    u32(strl, 0) // initialFrames
    u32(strl, 1); u32(strl, fps.toLong) // dwScale, dwRate -> fps = rate/scale
    u32(strl, 0) // start
    u32(strl, frames.size.toLong) // dwLength (in frames)
    u32(strl, maxFrame.toLong); u32(strl, 10000L) // bufSize, quality
    u32(strl, 0) // sampleSize
    u16(strl, 0); u16(strl, 0); u16(strl, w); u16(strl, h) // rcFrame
    fcc(strl, "strf"); u32(strl, 40)
    u32(strl, 40); u32(strl, w.toLong); u32(strl, h.toLong)
    u16(strl, 1); u16(strl, 24) // planes, bitCount
    fcc(strl, "MJPG") // biCompression
    u32(strl, (w.toLong * h * 3)); u32(strl, 0); u32(strl, 0)
    u32(strl, 0); u32(strl, 0)
    val strlBytes = strl.toByteArray
    fcc(hdrl, "LIST"); u32(hdrl, strlBytes.length.toLong)
    hdrl.write(strlBytes, 0, strlBytes.length)

    val hdrlBytes = hdrl.toByteArray
    val moviBytes = movi.toByteArray
    val body = new ByteArrayOutputStream()
    fcc(body, "AVI ")
    fcc(body, "LIST"); u32(body, hdrlBytes.length.toLong)
    body.write(hdrlBytes, 0, hdrlBytes.length)
    fcc(body, "LIST"); u32(body, moviBytes.length.toLong)
    body.write(moviBytes, 0, moviBytes.length)
    val bodyBytes = body.toByteArray
    val out = new ByteArrayOutputStream()
    fcc(out, "RIFF"); u32(out, bodyBytes.length.toLong)
    out.write(bodyBytes, 0, bodyBytes.length)
    out.toByteArray
  }

  // ---- RIFF/AVI parser --------------------------------------------------

  /** Parsed container metadata (header only — no frame payload copied,
    * no JPEG touched) plus the [offset, length) of each movi frame
    * chunk so frame access is a byte slice. */
  private[graft] final case class AviMeta(
      width: Int, height: Int, usPerFrame: Long, totalFrames: Long,
      scale: Long, rate: Long, handler: String, streams: Long,
      frameOffsets: Vector[(Int, Int)])

  private def rdU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def rdFcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"not an MJPEG AVI: $msg")

  /** Walk the RIFF tree: validate magic, read avih/strh/strf, index the
    * movi '00dc'/'00db' chunks. Every layer is cross-checked against
    * the others — a disagreement is corruption and fails LOUD. */
  private[graft] def parseMeta(bytes: Array[Byte]): AviMeta = {
    if (bytes.length < 12 || rdFcc(bytes, 0) != "RIFF") fail("missing RIFF magic")
    val riffLen = rdU32(bytes, 4)
    if (riffLen + 8 > bytes.length) fail(s"RIFF size $riffLen overruns buffer")
    if (rdFcc(bytes, 8) != "AVI ") fail("RIFF form is not 'AVI '")
    var w = -1; var h = -1; var us = -1L; var total = -1L
    var scale = -1L; var rate = -1L; var handler = ""; var streams = -1L
    var strhLen = -1L; var strfW = -1L; var strfH = -1L
    val frames = Vector.newBuilder[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = rdFcc(bytes, o)
        val len = rdU32(bytes, o + 4).toInt
        val payload = o + 8
        if (payload + len > to) fail(s"chunk $id overruns its parent list")
        id match {
          case "LIST" =>
            val listType = rdFcc(bytes, payload)
            if (listType == "hdrl" || listType == "strl" || listType == "movi") {
              if (listType == "movi") {
                var m = payload + 4
                while (m + 8 <= payload + len) {
                  val cid = rdFcc(bytes, m)
                  val clen = rdU32(bytes, m + 4).toInt
                  if (cid == "00dc" || cid == "00db")
                    frames += ((m + 8, clen))
                  m += 8 + clen + (clen % 2)
                }
              } else walk(payload + 4, payload + len)
            }
          case "avih" =>
            us = rdU32(bytes, payload)
            total = rdU32(bytes, payload + 16)
            streams = rdU32(bytes, payload + 24)
            w = rdU32(bytes, payload + 32).toInt
            h = rdU32(bytes, payload + 36).toInt
          case "strh" =>
            if (rdFcc(bytes, payload) != "vids") fail("first stream is not video")
            handler = rdFcc(bytes, payload + 4).toLowerCase(java.util.Locale.ROOT)
            scale = rdU32(bytes, payload + 20)
            rate = rdU32(bytes, payload + 24)
            strhLen = rdU32(bytes, payload + 32)
          case "strf" =>
            strfW = rdU32(bytes, payload + 4)
            strfH = rdU32(bytes, payload + 8)
          case _ => // unknown chunks skip (idx1, JUNK, ...)
        }
        o = payload + len + (len % 2)
      }
    }
    walk(12, (riffLen + 8).toInt)
    val fr = frames.result()
    if (w <= 0 || h <= 0 || us <= 0 || total < 0) fail("missing/invalid avih")
    if (handler != "mjpg") fail(s"stream handler '$handler' is not MJPG " +
      "(inter-frame codecs are honestly stubbed — no JDK decoder)")
    if (strfW != w || strfH != h) fail(
      s"strf dims ${strfW}x$strfH disagree with avih ${w}x$h")
    if (strhLen != total || fr.size.toLong != total) fail(
      s"frame counts disagree: avih=$total strh=$strhLen movi=${fr.size}")
    AviMeta(w, h, us, total, scale, rate, handler, streams, fr)
  }

  /** Decode one indexed frame (a byte slice handed to the JDK JPEG
    * reader), cross-checking decoded dims against the container's. */
  private[graft] def decodeFrame(bytes: Array[Byte], meta: AviMeta,
      idx: Int): Array[Int] = {
    init
    val (off, len) = meta.frameOffsets(idx)
    val img = ImageIO.read(new ByteArrayInputStream(bytes, off, len))
    if (img == null) fail(s"frame $idx is not JPEG-decodable")
    if (img.getWidth != meta.width || img.getHeight != meta.height) fail(
      s"frame $idx decoded ${img.getWidth}x${img.getHeight} != container " +
        s"${meta.width}x${meta.height}")
    val rgbs = img.getRGB(0, 0, meta.width, meta.height, null, 0, meta.width)
    val gray = new Array[Int](rgbs.length)
    var i = 0
    while (i < rgbs.length) {
      val rgb = rgbs(i)
      gray(i) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      i += 1
    }
    gray
  }

  // ---- operators --------------------------------------------------------

  /** The deterministic MJPEG/AVI fixture: (doc_id, video binary), one
    * real container with real JPEG frames per document. Map-side. */
  def synthesize(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        init
        ids.map { id =>
          val (w, h, n, fps) = synthParams(id)
          val frames = (0 until n).map(f => jpegEncode(w, h, synthFramePixels(id, f)))
          (id, encodeAvi(w, h, fps, frames))
        }
      }
      .toDF("doc_id", "video")
  }

  /** Container metadata over a binary video column — dims, frame count,
    * frame rate, handler, WITHOUT touching a single JPEG payload (the
    * cheap 100 TB metadata pass; the RIFF walk reads headers and chunk
    * sizes only). */
  def videoMeta(spark: SparkSession, binDf: DataFrame): DataFrame = {
    import spark.implicits._
    binDf.select(col("doc_id"), col("video")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        init
        rows.map { case (id, bytes) =>
          val m = parseMeta(bytes)
          (id, m.width, m.height, m.totalFrames, m.usPerFrame,
            m.rate / math.max(m.scale, 1), m.handler, m.streams,
            bytes.length.toLong)
        }
      }
      .toDF("doc_id", "width", "height", "n_frames", "us_per_frame",
        "fps", "format", "n_streams", "n_bytes")
  }

  /** REAL frame decode, one output row per frame: exact container
    * fields plus the decoded luminance sum. JPEG is lossy, so the sum
    * itself is not oracle-exact — the catalog entry joins it against a
    * reference-stats frame and gates the self-validating bound
    * `ok` ⟺ |decoded mean − reference mean| < 8, computed
    * integer-exactly as |sum − expected| < 8·n_px (the a5_approx_uv
    * pattern). A flatMap — one video in, n_frames rows out, no
    * shuffle. */
  def frameTable(spark: SparkSession, binDf: DataFrame): DataFrame = {
    import spark.implicits._
    binDf.select(col("doc_id"), col("video")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        init
        val m = parseMeta(bytes)
        (0 until m.totalFrames.toInt).iterator.map { f =>
          val gray = decodeFrame(bytes, m, f)
          var sum = 0L
          var i = 0
          while (i < gray.length) { sum += gray(i); i += 1 }
          (id, f, m.width, m.height, gray.length.toLong, sum)
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "n_px", "sum_lum")
  }

  /** Keyframe perceptual hashes — the industry-standard cheap video
    * near-dup key: decode ONLY frame 0 of each video (one JPEG per
    * video regardless of length) and hash it with the image arm's
    * aHash64. Output (doc_id, khash) — feed the shared
    * [[Fingerprints]] machinery. NOTE on matching radius: JPEG decode
    * is deterministic, so byte-identical videos always produce EQUAL
    * hashes and hamming 0 is exact-duplicate detection with no codec
    * caveat; hamming > 0 additionally catches re-encoded/perturbed
    * keyframes but its distance structure inherits JPEG quantization
    * noise (engine-consistent, not formula-predictable — the catalog
    * entry therefore gates the hamming-0 form). */
  def keyframeHashes(spark: SparkSession, binDf: DataFrame): DataFrame = {
    import spark.implicits._
    binDf.select(col("doc_id"), col("video")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        init
        rows.map { case (id, bytes) =>
          val m = parseMeta(bytes)
          require(m.totalFrames > 0, s"doc $id: zero-frame video")
          val gray = decodeFrame(bytes, m, 0)
          (id, Images.aHash64(gray, m.width, m.height))
        }
      }
      .toDF("doc_id", "khash")
  }

  /** Keeper selection over keyframe hashes (see [[keyframeHashes]]):
    * one row per video, keep ⟺ this doc is the min doc_id of its
    * ≤-maxHamming keyframe neighborhood. Default maxHamming = 0 —
    * exact keyframe duplicates, codec-caveat-free. */
  def nearDupKeepers(spark: SparkSession, binDf: DataFrame,
      maxHamming: Int = 0): DataFrame =
    Fingerprints.nearDupKeepers(keyframeHashes(spark, binDf), "khash", maxHamming)

  /** Frame sampling that decodes ONLY the sampled frames: every
    * `stride`-th frame per video (frame 0 always included), stamped
    * with its exact presentation time in µs (frame_idx · usPerFrame).
    * The unsampled JPEG payloads are never read — the property a
    * 100 TB sampling pass lives on. */
  def sampleFrames(spark: SparkSession, binDf: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    import spark.implicits._
    binDf.select(col("doc_id"), col("video")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        init
        val m = parseMeta(bytes)
        (0 until m.totalFrames.toInt by stride).iterator.map { f =>
          val gray = decodeFrame(bytes, m, f)
          var sum = 0L
          var i = 0
          while (i < gray.length) { sum += gray(i); i += 1 }
          (id, f, f * m.usPerFrame, m.width, m.height, gray.length.toLong, sum)
        }
      }
      .toDF("doc_id", "frame_idx", "pts_us", "width", "height", "n_px", "sum_lum")
  }
}
