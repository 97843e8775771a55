package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL image decode arm of the multimodal layer (the builder-prompt
  * "multimodal columns" contract; round-12 — the round-11 stub premise
  * "this environment has no codec libraries" is refuted for images:
  * JDK 17's `javax.imageio` decodes PNG/JPEG/BMP/GIF/TIFF headlessly
  * with zero extra dependencies, so the decode step here is a real
  * codec, not [[Multimodal]]'s md5 fake — audio/video stay honestly
  * stubbed there).
  *
  * Pipeline shape (the pattern a production image corpus needs):
  *   - images ride an opaque `binary` column ([[synthesize]] builds the
  *     deterministic PNG fixture from doc_id since the testdata has no
  *     media column; a real corpus reads its parquet binary column);
  *   - [[imageMeta]] reads width/height/format from the codec HEADER
  *     only (no pixel decode — the cheap full-corpus scan);
  *   - [[imageStats]] fully decodes and emits integer-exact luminance
  *     stats plus a 64-bit average-hash ([[aHash64]]) — the perceptual
  *     fingerprint every image-dedup pipeline keys on;
  *   - [[nearDupPairs]] buckets the hashes by 16-bit bands and verifies
  *     candidates by exact hamming distance — the SimHash/MinHash
  *     banding shape of the text dedup layer, applied to pixels.
  *
  * Scale: every stage is map-side per image except the band join (one
  * shuffle on small (band, value) keys) and the pair distinct (one
  * shuffle on the candidate pairs — bounded by true duplicate-group
  * sizes, which is the output's own size; a corpus with pathological
  * hash-collision groups caps them the way Dedup.minhashPairs caps hot
  * buckets). Decoders initialize per PARTITION (ImageIO scanner lookup
  * + disk-cache disabling happen once), rows stream through.
  *
  * Oracle story: the fixture's pixel function is pure integer
  * arithmetic over (x, y, doc_id), so DuckDB recomputes the DECODED
  * pixels, stats, and hash from first principles while the engine goes
  * pixels → PNG encode → PNG decode → stats — a hash match certifies
  * the whole codec round trip (PNG is lossless) plus the aHash kernel,
  * cross-engine (t_image_meta / t_image_dedup).
  */
object Images {

  // ImageIO's default read path spills a disk cache file per stream —
  // per-row temp files on an executor; keep everything on-heap
  private lazy val init: Unit = {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  /** Deterministic grayscale-in-RGB pixel function of (x, y, doc_id) —
    * pure integer arithmetic, exactly reproducible in SQL (the DuckDB
    * oracle recomputes it): group g = doc_id % 200 picks dims and the
    * base pattern (a multiplicative mix — a LINEAR gradient would make
    * aHash shift-invariant across groups and collapse every group to
    * one hash); variant v = doc_id / 200 perturbs ONE pixel, so
    * same-group images are near-duplicates (hamming ≤ 3 — measured:
    * every ≤3 pair at sf0.1 is same-group, zero cross-group noise) and
    * v % 7 == 0 variants are exact duplicates. */
  private[graft] def synthPixels(docId: Long): (Int, Int, Array[Int]) = {
    val g = docId % 200
    val v = docId / 200
    val w = (8 * (1 + (g % 8))).toInt
    val h = (8 * (1 + ((g / 8) % 5))).toInt
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p0 = ((x * 2654435761L + y * 40503L + (x + 3L) * (y + 7L) * (g + 13L) +
          g * 2246822519L) % 256L).toInt
        px(y * w + x) =
          if (x == 3 && y == 5) ((p0 + (v % 7) * 16) % 256).toInt else p0
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** The four JDK-native LOSSLESS writers, picked per doc by
    * doc_id % 4 — the fixture's format column carries live signal (a
    * constant-'png' corpus proved nothing about the scanner's format
    * dispatch). Grayscale ≤ 256 distinct colors keeps GIF's palette
    * exact; readers report TIFF as 'tif'. JPEG stays out of the oracle
    * fixture (lossy — spec-tolerance-tested only in ImagesSpec). */
  private[graft] def writerOf(docId: Long): String =
    (docId % 4) match {
      case 0 => "png"
      case 1 => "bmp"
      case 2 => "gif"
      case _ => "tiff"
    }

  /** The format name the ImageIO READER reports for [[writerOf]]'s
    * output — what imageMeta/imageStats surface ('tif', not 'tiff'). */
  private[graft] def readerNameOf(docId: Long): String =
    if (docId % 4 == 3) "tif" else writerOf(docId)

  /** Encode a grayscale pixel array (r = g = b = lum) with the given
    * lossless writer; decode returns the exact array. */
  private[graft] def encodeImage(w: Int, h: Int, px: Array[Int],
      format: String): Array[Byte] = {
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
    require(ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
    bos.toByteArray
  }

  private[graft] def encodePng(w: Int, h: Int, px: Array[Int]): Array[Byte] =
    encodeImage(w, h, px, "png")

  /** Decoded image: format name (lowercase), dims, gray pixel array
    * (gray = (r + g + b) / 3, integer division — exact for the r=g=b
    * fixture and deterministic for any RGB input). */
  private[graft] final case class Decoded(
      format: String, width: Int, height: Int, gray: Array[Int])

  private[graft] def decode(bytes: Array[Byte]): Decoded = {
    init
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no ImageIO reader for this byte stream " +
        "(not a PNG/JPEG/BMP/GIF/TIFF?)")
      val r = readers.next()
      try {
        r.setInput(iis)
        val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
        val img = r.read(0)
        val w = img.getWidth
        val h = img.getHeight
        // bulk getRGB: one ColorModel-converted row-major pass instead of
        // w*h per-pixel calls — bit-identical pixels (ImagesSpec pins the
        // round trip), ~2-5x less decode wall, and decode IS the measured
        // bottleneck of the keeper pipeline (SCALE.md §Round-12)
        val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
        val gray = new Array[Int](w * h)
        var i = 0
        while (i < rgbs.length) {
          val rgb = rgbs(i)
          gray(i) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          i += 1
        }
        Decoded(fmt, w, h, gray)
      } finally r.dispose()
    } finally iis.close()
  }

  /** Header-only (width, height, format) — NO pixel decode: the format
    * scanner reads a few header bytes, which is what a 100 TB metadata
    * pass can afford. */
  private[graft] def decodeHeader(bytes: Array[Byte]): (String, Int, Int) = {
    init
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no ImageIO reader for this byte stream")
      val r = readers.next()
      try {
        r.setInput(iis)
        (r.getFormatName.toLowerCase(java.util.Locale.ROOT), r.getWidth(0), r.getHeight(0))
      } finally r.dispose()
    } finally iis.close()
  }

  /** 64-bit average hash (aHash) over a gray image: 8×8 blocks with
    * floor boundaries (block (i, j) covers y ∈ [⌊i·h/8⌋, ⌊(i+1)·h/8⌋),
    * x likewise), bit k = i·8 + j set iff the block's mean luminance
    * exceeds the global mean — INTEGER-EXACT as the cross-multiplied
    * comparison blockSum·nPixels > totalSum·blockArea (no division, so
    * the DuckDB oracle reproduces every bit; products stay far under
    * Long range: 255·npx·npx needs npx < 2^27 ≈ a 134 MP image). Bit 63
    * rides the sign bit — two's complement in both engines, and XOR /
    * bit_count agree on it. Blocks smaller than 8 px in a dimension are
    * legal (empty blocks contribute 0-bits, same as a no-row group in
    * SQL). */
  private[graft] def aHash64(gray: Array[Int], w: Int, h: Int): Long = {
    val bs = new Array[Long](64)
    val ba = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val bi = y * 8 / h
      var x = 0
      while (x < w) {
        val k = bi * 8 + x * 8 / w
        val p = gray(y * w + x)
        bs(k) += p
        ba(k) += 1
        total += p
        x += 1
      }
      y += 1
    }
    val npx = w.toLong * h
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (bs(k) * npx > total * ba(k)) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** The deterministic MIXED-FORMAT image fixture: (doc_id, img binary)
    * with one real encoded PNG/BMP/GIF/TIFF per document (see
    * [[synthPixels]]/[[writerOf]] — all four writers are lossless on
    * the grayscale fixture, so the per-formula oracle still certifies
    * every decoded pixel). Partition-parallel mapPartitions — the same
    * batch shape a real corpus's binary column arrives in. */
  def synthesize(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        init
        ids.map { id =>
          val (w, h, px) = synthPixels(id)
          (id, encodeImage(w, h, px, writerOf(id)))
        }
      }
      .toDF("doc_id", "img")
  }

  /** Header-only metadata over a binary image column — width, height,
    * format without decoding a single pixel. */
  def imageMeta(spark: SparkSession, binDf: DataFrame): DataFrame = {
    import spark.implicits._
    binDf.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        init
        rows.map { case (id, bytes) =>
          val (fmt, w, h) = decodeHeader(bytes)
          (id, w, h, fmt, bytes.length.toLong)
        }
      }
      .toDF("doc_id", "width", "height", "format", "n_bytes")
  }

  /** Full decode + integer-exact stats + perceptual hash, one pass:
    * (doc_id, width, height, format, n_px, sum_lum, min_lum, max_lum,
    * ahash). Header dims are cross-checked against decoded dims (a
    * codec disagreement is corruption — fail LOUD, not a silent wrong
    * hash). Empty (0-px) images are rejected by the same rule. */
  def imageStats(spark: SparkSession, binDf: DataFrame): DataFrame = {
    import spark.implicits._
    binDf.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        init
        rows.map { case (id, bytes) =>
          val (hfmt, hw, hh) = decodeHeader(bytes)
          val d = decode(bytes)
          require(d.width == hw && d.height == hh && d.format == hfmt,
            s"doc $id: header ($hfmt ${hw}x$hh) disagrees with decode " +
              s"(${d.format} ${d.width}x${d.height}) — corrupt image")
          require(d.gray.length > 0, s"doc $id: zero-pixel image")
          var sum = 0L
          var mn = 255
          var mx = 0
          var i = 0
          while (i < d.gray.length) {
            val p = d.gray(i)
            sum += p
            if (p < mn) mn = p
            if (p > mx) mx = p
            i += 1
          }
          (id, d.width, d.height, d.format, d.gray.length.toLong, sum, mn, mx,
            aHash64(d.gray, d.width, d.height))
        }
      }
      .toDF("doc_id", "width", "height", "format", "n_px", "sum_lum",
        "min_lum", "max_lum", "ahash")
  }

  /** Image near-duplicate pairs by banded hamming join over the 64-bit
    * aHash: each hash splits into four 16-bit bands; candidates share
    * at least one band; survivors verify exact hamming ≤ `maxHamming`.
    * LOSSLESS for maxHamming ≤ 3 by pigeonhole (3 differing bits cannot
    * touch all 4 bands — enforced, because a silently lossy recall
    * default is the silent-wrong class this repo refuses), and the
    * oracle's ALL-PAIRS xor/bit_count join certifies exactly that.
    * Output (doc_a < doc_b, hamming), the Dedup.minhashPairs shape —
    * feed keeper selection or duplicateClusters unchanged. One shuffle
    * on (band, value), one on the candidate distinct. */
  /** REAL image downsampling (the round-13 replacement for
    * Multimodal.resize's byte-level stub): each output pixel is the
    * BLOCK MEAN of its `factor`×`factor` input block with floor
    * division — integer-exact, so the oracle recomputes every output
    * pixel from the fixture formula and the catalog entry certifies
    * the full decode → resize → re-encode(PNG) → re-decode chain
    * through TWO codec round trips. Requires dims divisible by
    * `factor` (fail LOUD — a silent edge-block average would be the
    * silent-wrong class; real corpora pad or crop first, and the
    * fixture's dims are multiples of 8). Map-side, no shuffle. Output
    * (doc_id, img) PNG — feed [[imageStats]]/[[imageMeta]] unchanged. */
  def resize(spark: SparkSession, binDf: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, s"factor must be positive, got $factor")
    import spark.implicits._
    binDf.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        init
        rows.map { case (id, bytes) =>
          val d = decode(bytes)
          require(d.width % factor == 0 && d.height % factor == 0,
            s"doc $id: dims ${d.width}x${d.height} not divisible by $factor " +
              "— pad or crop before block-mean resizing")
          val wo = d.width / factor
          val ho = d.height / factor
          val out = new Array[Int](wo * ho)
          // block sum accumulates in a Long: 255 * factor² overflows Int
          // from factor ≈ 2900 up, and a silently wrapped mean is the
          // silent-wrong class this repo refuses
          val area = factor.toLong * factor
          var yo = 0
          while (yo < ho) {
            var xo = 0
            while (xo < wo) {
              var sum = 0L
              var dy = 0
              while (dy < factor) {
                var dx = 0
                val base = (yo * factor + dy) * d.width + xo * factor
                while (dx < factor) { sum += d.gray(base + dx); dx += 1 }
                dy += 1
              }
              out(yo * wo + xo) = (sum / area).toInt
              xo += 1
            }
            yo += 1
          }
          (id, encodeImage(wo, ho, out, "png"))
        }
      }
      .toDF("doc_id", "img")
  }

  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    Fingerprints.nearDupPairs(hashes, "ahash", maxHamming)

  /** Keeper selection WITHOUT pair emission — the 100 TB form of image
    * near-dup removal. [[nearDupPairs]]' output is inherently quadratic
    * in duplicate-group size (measured: the dense-dup sweep fixture
    * yields 56M pairs / 546 MB shuffle at 150k docs); a dedup decision
    * does not need the pairs. This operator collapses EXACT-hash
    * duplicates first (one ahash-keyed partial agg → min doc_id per
    * DISTINCT hash — distinct hashes ≪ docs on any dup-dense corpus),
    * runs the banded hamming join among distinct hashes only, and takes
    * m(H) = min over H's ≤-maxHamming neighborhood (self included) of
    * each neighbor hash's min doc_id. keep(d) ⟺ doc_id == m(hash(d)):
    * exactly the docs that survive [[nearDupPairs]]' drop-doc_b rule
    * (d drops iff some d' < d sits within maxHamming — if d is not its
    * neighborhood's min, that min is such a d'; if it is, none exists).
    * ImagesSpec pins keepers == corpus minus pair-losers; the oracle
    * recomputes m(H) by all-pairs over distinct hashes. Output one row
    * per input doc: (doc_id, ahash, keep). */
  def nearDupKeepers(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    Fingerprints.nearDupKeepers(hashes, "ahash", maxHamming)

  private[graft] def requireLossless(maxHamming: Int): Unit =
    Fingerprints.requireLossless(maxHamming)

  /** CURATION-posture profile — one decode pass with the same gate
    * inputs as [[imageStats]] but corrupt scrape bytes LABELED, never
    * thrown (the video arm's gatedProfile posture, extended to images:
    * a 100 TB scrape pass must quarantine bad files, not die on one;
    * the loud-fail contract stays on the analysis operators). Corrupt
    * rows carry zeroed stats and a zero hash — never consulted,
    * because the corrupt gate PRECEDES every other gate and corrupt
    * rows never enter the survivor set (so the dummy hash never
    * registers or pairs). Output
    * (doc_id, corrupt, n_px, sum_lum, min_lum, max_lum, ahash). */
  private[graft] def curationProfile(spark: SparkSession,
      binDf: DataFrame): DataFrame = {
    import spark.implicits._
    binDf.select(col("doc_id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        init
        rows.map { case (id, bytes) =>
          try {
            val d = decode(bytes)
            require(d.gray.length > 0, s"doc $id: zero-pixel image")
            var sum = 0L
            var mn = 255
            var mx = 0
            var i = 0
            while (i < d.gray.length) {
              val p = d.gray(i)
              sum += p
              if (p < mn) mn = p
              if (p > mx) mx = p
              i += 1
            }
            (id, false, d.gray.length.toLong, sum, mn, mx,
              aHash64(d.gray, d.width, d.height))
          } catch {
            case scala.util.control.NonFatal(_) =>
              (id, true, 0L, 0L, 0, 0, 0L)
          }
        }
      }
      .toDF("doc_id", "corrupt", "n_px", "sum_lum", "min_lum", "max_lum",
        "ahash")
  }

  /** IMAGE decontamination — drop training images within `maxHamming`
    * of any eval-set image's aHash (benchmark-leakage removal, the
    * media twin of text decontamination). Both sides decode once; the
    * probe is the shared recall-lossless banded join, eval side tiny.
    * Output (doc_id, ahash, keep) per corpus image. */
  def decontaminate(spark: SparkSession, corpus: DataFrame,
      evalSet: DataFrame, maxHamming: Int = 3): DataFrame =
    Fingerprints.decontaminate(
      imageStats(spark, corpus).select(col("doc_id"), col("ahash")),
      imageStats(spark, evalSet).select(col("doc_id"), col("ahash")),
      "ahash", maxHamming)

  /** Cross-frame hamming pairs over (doc_id, ahash) frames — the
    * streaming registry probe (see [[Fingerprints.hammingPairsAcross]]). */
  private[graft] def hammingPairsAcross(news: DataFrame, olds: DataFrame,
      maxHamming: Int): DataFrame =
    Fingerprints.hammingPairsAcross(news, olds, "ahash", maxHamming)
}
