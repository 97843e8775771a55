package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Images
import graft.tables.Tables

/** The real ImageIO decode arm: codec round trip, header/decode
  * consistency, aHash kernel semantics, and the banding losslessness
  * the t_image_dedup oracle certifies cross-engine. */
class ImagesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  /** Independent per-pixel reference for the aHash (the oracle's
    * formulation transcribed, kept separate from the kernel's
    * single-pass form). */
  private def refAHash(gray: Array[Int], w: Int, h: Int): Long = {
    val bs = Array.ofDim[Long](8, 8)
    val ba = Array.ofDim[Long](8, 8)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      bs(y * 8 / h)(x * 8 / w) += gray(y * w + x)
      ba(y * 8 / h)(x * 8 / w) += 1
      total += gray(y * w + x)
    }
    (for (i <- 0 until 8; j <- 0 until 8
          if bs(i)(j) * (w.toLong * h) > total * ba(i)(j))
      yield 1L << (i * 8 + j)).foldLeft(0L)(_ | _)
  }

  test("PNG encode -> ImageIO decode is pixel-exact; header matches decode") {
    // spans group bases (v = 0), perturbed variants (v > 0), and both
    // parity classes of the perturbation cycle (v % 7 == 0 → exact dup)
    for (docId <- Seq(0L, 3L, 199L, 200L, 417L, 1400L, 4999L)) {
      val (w, h, px) = Images.synthPixels(docId)
      val png = Images.encodePng(w, h, px)
      val (hfmt, hw, hh) = Images.decodeHeader(png)
      assert((hfmt, hw, hh) === (("png", w, h)), s"header mismatch for doc $docId")
      val d = Images.decode(png)
      assert(d.format === "png" && d.width === w && d.height === h)
      assert(d.gray.toSeq === px.toSeq,
        s"codec round trip not pixel-exact for doc $docId")
      assert(Images.aHash64(d.gray, w, h) === refAHash(px, w, h),
        s"aHash kernel != reference for doc $docId")
    }
  }

  test("BMP round-trips losslessly too; format names surface per codec") {
    // the decode arm is format-agnostic (ImageIO scanner picks the
    // reader from the bytes): same pixels through a second lossless
    // codec decode identically, with the format name telling them apart
    val (w, h, px) = Images.synthPixels(42L)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(y * w + x)
      img.setRGB(x, y, (p << 16) | (p << 8) | p)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val d = Images.decode(bos.toByteArray)
    assert(d.format === "bmp" && d.width === w && d.height === h)
    assert(d.gray.toSeq === px.toSeq, "BMP round trip not pixel-exact")
  }

  test("JPEG decodes too (lossy): exact dims/format, luminance within codec tolerance") {
    // the lossy arm cannot pin pixels (quantization is encoder's
    // choice), but dims and format are exact and the decoded luminance
    // field must stay CLOSE — the self-validating-bound posture
    val (w, h, px) = Images.synthPixels(7L)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(y * w + x)
      img.setRGB(x, y, (p << 16) | (p << 8) | p)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val d = Images.decode(bos.toByteArray)
    assert(d.format === "jpeg" && d.width === w && d.height === h)
    val meanTrue = px.map(_.toLong).sum.toDouble / px.length
    val meanDec = d.gray.map(_.toLong).sum.toDouble / d.gray.length
    assert(math.abs(meanTrue - meanDec) < 8.0,
      s"JPEG mean luminance drifted: true $meanTrue vs decoded $meanDec")
  }

  test("corrupt bytes fail LOUD at decode, not as a silent wrong hash") {
    val e = intercept[IllegalArgumentException] {
      Images.decode("not an image at all".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("no ImageIO reader"))
  }

  test("imageStats over the synthesized corpus: dims, integer stats, exact-dup hashes") {
    val stats = Images.imageStats(spark,
      Images.synthesize(spark, Tables.documents(spark, dir))).persist()
    try {
      val rows = stats.collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4),
          r.getLong(5), r.getInt(6), r.getInt(7), r.getLong(8)))).toMap
      assert(rows.size === 500)
      // dims follow the fixture formula; n_px = w*h; the format column
      // carries the per-doc mixed-format signal (doc_id % 4)
      rows.foreach { case (id, (w, h, fmt, npx, sum, mn, mx, _)) =>
        val g = id % 200
        assert(w === 8 * (1 + (g % 8)).toInt && h === 8 * (1 + ((g / 8) % 5)).toInt)
        assert(fmt === Images.readerNameOf(id) && npx === w.toLong * h)
        assert(mn >= 0 && mx <= 255 && sum >= npx * mn && sum <= npx * mx)
      }
      assert(rows.values.map(_._3).toSet === Set("png", "bmp", "gif", "tif"),
        "mixed-format fixture must exercise all four lossless codecs")
      // v % 7 == 0 variants are bit-exact duplicates of their group base
      // (docs 0 and 0 + 200*7 = 1400 would be; at sf0.001 ids stop at
      // 499, so use v=0 vs v=7?  v max = 499/200 = 2 → compare equal-g,
      // equal-(v%7) pairs do not exist; assert instead that the base
      // and its v=1 variant differ ONLY via the one perturbed pixel:
      // hamming between their hashes is tiny
      val h0 = rows(5L)._8
      val h1 = rows(205L)._8 // same g = 5, v = 1
      assert(java.lang.Long.bitCount(h0 ^ h1) <= 3,
        "1-pixel perturbation must stay within hamming 3")
      // header-only pass agrees with the full decode on every doc
      val metaRows = Images.imageMeta(spark,
        Images.synthesize(spark, Tables.documents(spark, dir)))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      rows.foreach { case (id, (w, h, fmt, _, _, _, _, _)) =>
        assert(metaRows(id) === ((w, h, fmt)))
      }
    } finally { stats.unpersist(blocking = false); () }
  }

  test("banded near-dup join is LOSSLESS vs brute-force hamming <= 3; cap refused above 3") {
    val stats = Images.imageStats(spark,
      Images.synthesize(spark, Tables.documents(spark, dir)))
      .select(col("doc_id"), col("ahash")).persist()
    try {
      val banded = Images.nearDupPairs(stats, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // driver-side brute force over all 500 hashes (the oracle's shape)
      val hs = stats.collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = (for {
        (a, ha) <- hs; (b, hb) <- hs if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (a, b, d.toLong)).toSet
      assert(banded === brute,
        s"banding lost ${(brute -- banded).size} pairs / invented ${(banded -- brute).size}")
      assert(brute.nonEmpty, "fixture must produce live near-dup pairs")
      // pairs are same-group by construction (zero cross-group noise)
      assert(brute.forall { case (a, b, _) => a % 200 == b % 200 })
      val e = intercept[IllegalArgumentException] {
        Images.nearDupPairs(stats, maxHamming = 4)
      }
      assert(e.getMessage.contains("recall-lossless"))
      // plan shape: the candidate join is keyed on (band, value) — an
      // equi-join, never a cartesian/broadcast-nested-loop over the corpus
      val plan = Images.nearDupPairs(stats).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"banded join degenerated to a product:\n$plan")
    } finally { stats.unpersist(blocking = false); () }
  }

  test("resize(2): block means match a driver reference through two codec round trips") {
    val resized = Images.resize(spark,
      Images.synthesize(spark, Tables.documents(spark, dir)), factor = 2)
    val rows = resized.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(rows.length === 500)
    for ((id, bytes) <- rows.take(12) ++ rows.takeRight(4)) {
      val d = Images.decode(bytes)
      val (w, h, px) = Images.synthPixels(id)
      assert(d.format === "png" && d.width === w / 2 && d.height === h / 2)
      val want = for (yo <- 0 until h / 2; xo <- 0 until w / 2) yield
        (px(2 * yo * w + 2 * xo) + px(2 * yo * w + 2 * xo + 1) +
          px((2 * yo + 1) * w + 2 * xo) + px((2 * yo + 1) * w + 2 * xo + 1)) / 4
      assert(d.gray.toSeq === want,
        s"block means != reference for doc $id")
    }
    // non-divisible dims fail LOUD, never a silently-averaged edge block
    val odd = Images.encodePng(7, 6, Array.fill(42)(5))
    import spark.implicits._
    val e = intercept[org.apache.spark.SparkException] {
      Images.resize(spark, Seq((1L, odd)).toDF("doc_id", "img"), factor = 2).count()
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("not divisible"))))
    assert(intercept[IllegalArgumentException] {
      Images.resize(spark, resized, factor = 0)
    }.getMessage.contains("positive"))
  }

  test("nearDupKeepers == the pair form's drop-doc_b decision, without emitting pairs") {
    val stats = Images.imageStats(spark,
      Images.synthesize(spark, Tables.documents(spark, dir)))
      .select(col("doc_id"), col("ahash")).persist()
    try {
      val keepers = Images.nearDupKeepers(stats)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(keepers.size === 500, "one keep/drop row per input doc")
      val losers = Images.nearDupPairs(stats)
        .select(col("doc_b")).distinct().collect().map(_.getLong(0)).toSet
      val keptWant = (0L until 500L).toSet -- losers
      val keptGot = keepers.filter(_._2).keySet
      assert(keptGot === keptWant,
        s"keepers diverge from pair drop-doc_b: extra=${keptGot -- keptWant} " +
          s"missing=${keptWant -- keptGot}")
      assert(losers.nonEmpty && keptGot.nonEmpty)
    } finally { stats.unpersist(blocking = false); () }
  }
}
