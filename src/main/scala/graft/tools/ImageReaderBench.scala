package graft.tools

import java.io.ByteArrayInputStream
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import javax.imageio.ImageIO
import javax.imageio.spi.{IIORegistry, ImageReaderSpi}

import graft.operators.Images

/** Round-14 microbench (verdict item: "ImageIO registry microbench"):
  * does `ImageIO.getImageReaders` — which consults the IIORegistry on
  * EVERY call — convoy under 32 threads the way AudioSystem's
  * JDK13Services lock did (28→43 µs/call, round 13)? Three variants
  * over the mixed PNG/BMP/GIF/TIFF fixture bytes, each at 1 and 32
  * threads:
  *   registry — the production path (createImageInputStream +
  *              getImageReaders + full read), Images.decode itself;
  *   cachedSpi — candidate ImageReaderSpi list held in a lazy val
  *              (ONE registry walk at class load, the audio-arm
  *              ServiceLoader trick), probe canDecodeInput ourselves,
  *              createReaderInstance per call;
  *   probeOnly — just the getImageReaders registry consult, no read,
  *              to isolate the suspected lock.
  * Adopt the cached path ONLY if the numbers show a convoy (threads
  * making calls slower); record either way in SCALE.md. */
object ImageReaderBench {

  private lazy val cachedSpis: Array[ImageReaderSpi] = {
    val it = IIORegistry.getDefaultInstance
      .getServiceProviders(classOf[ImageReaderSpi], true)
    val b = Array.newBuilder[ImageReaderSpi]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def decodeCached(bytes: Array[Byte]): Int = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      var i = 0
      while (i < cachedSpis.length) {
        val spi = cachedSpis(i)
        if (spi.canDecodeInput(iis)) {
          val r = spi.createReaderInstance()
          try {
            r.setInput(iis)
            val img = r.read(0)
            return img.getWidth * img.getHeight
          } finally r.dispose()
        }
        i += 1
      }
      throw new IllegalArgumentException("no reader")
    } finally iis.close()
  }

  private def probeOnly(bytes: Array[Byte]): Int = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try { if (ImageIO.getImageReaders(iis).hasNext) 1 else 0 }
    finally iis.close()
  }

  private def run(name: String, threads: Int, ops: Int,
      fixture: Array[Array[Byte]], f: Array[Byte] => Int): Unit = {
    val pool = Executors.newFixedThreadPool(threads)
    val latch = new CountDownLatch(threads)
    val perThread = ops / threads
    val t0 = System.nanoTime()
    for (t <- 0 until threads) pool.execute { () =>
      try {
        var i = 0
        var acc = 0
        while (i < perThread) { acc += f(fixture((t + i) % fixture.length)); i += 1 }
        if (acc == Int.MinValue) println("") // keep acc live
      } catch {
        case e: Throwable => println(s"worker $t failed: $e")
      } finally latch.countDown() // or a thrown decode hangs await() forever
    }
    latch.await()
    val us = (System.nanoTime() - t0) / 1000.0 / (perThread.toLong * threads)
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
    println(f"$name%-22s threads=$threads%2d ops=${perThread * threads}%7d  ${us}%8.1f us/call")
  }

  def main(args: Array[String]): Unit = {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
    // the real mixed-format fixture bytes (doc_id % 4 picks the writer)
    val fixture = (0L until 64L).toArray.map { id =>
      val (w, h, px) = Images.synthPixels(id)
      val fmt = (id % 4) match {
        case 0 => "png"; case 1 => "bmp"; case 2 => "gif"; case _ => "tiff"
      }
      Images.encodeImage(w, h, px, fmt)
    }
    val decodeOps = if (args.nonEmpty) args(0).toInt else 64000
    // warmup
    fixture.foreach(b => { Images.decode(b); decodeCached(b); probeOnly(b) })
    for (round <- 1 to 3) {
      println(s"-- round $round")
      run("probeOnly(registry)", 1, decodeOps, fixture, probeOnly)
      run("probeOnly(registry)", 32, decodeOps, fixture, probeOnly)
      run("decode(production)", 1, decodeOps, fixture,
        b => Images.decode(b).gray.length)
      run("decode(production)", 32, decodeOps, fixture,
        b => Images.decode(b).gray.length)
      run("decode(cachedSpi)", 1, decodeOps, fixture, decodeCached)
      run("decode(cachedSpi)", 32, decodeOps, fixture, decodeCached)
    }
  }
}
