package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (the builder-prompt contract).
  *
  * The decode step here is STUBBED with a deterministic md5-derived
  * fake, clearly marked below — for INTER-FRAME VIDEO CODECS only
  * (H.264/VP9/AV1...), where this JDK truly has no decoder. The other
  * stub premises fell round by round: IMAGES in round 12 ([[Images]],
  * real `javax.imageio` — PNG/JPEG/BMP/GIF/TIFF, oracle-gated by
  * t_image_meta / t_image_dedup); AUDIO in round 13 ([[Audio]], real
  * `javax.sound.sampled` — WAVE/AU/AIFF 16-bit PCM sample-exact,
  * oracle-gated by t_audio_meta / t_audio_dedup); and VIDEO partially
  * in round 13 ([[Video]] — AVI container metadata via a real RIFF
  * walker, plus REAL frame decode for MJPEG streams whose frames are
  * JPEGs the JDK codec reads; oracle-gated by t_video_meta /
  * t_video_frames / t_video_sample — and further in round 14:
  * uncompressed BI_RGB 'DIB ' AVIs decode bit-exactly with no codec at
  * all (t_video_frames_raw), and two-stream AVIs mux/demux a PCM audio
  * track end to end (t_video_demux_audio), so the ONLY remaining stub
  * is inter-frame compressed video). Everything around the remaining
  * inter-frame stub is real Spark plumbing: binary column schema,
  * per-partition batched iteration (mapPartitions ≈ mapInPandas batch
  * shape), typed output Dataset, and partition-parallel execution.
  * Swapping `decodeStub` for a real codec changes no signatures —
  * [[Images]], [[Audio]] and [[Video]] are the proof, three times
  * over.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int, format: String)

  /** Attach an opaque binary `content` column. Here: UTF-8 bytes of the
    * document text (the testdata has no true media column); in production
    * this is the parquet/Delta binary column itself. */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(coalesce(col("text"), lit("")), "UTF-8").as("content"))

  /** STUB decoder: fake width/height derived from the first md5 bytes of
    * the content — deterministic so tests and oracles can pin it. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val w = 1 + (java.lang.Byte.toUnsignedInt(md(0)) % 64)
    val h = 1 + (java.lang.Byte.toUnsignedInt(md(1)) % 64)
    (w, h, "stub")
  }

  case class Frame(doc_id: Long, frame_idx: Int, pts_ms: Long, frame: Array[Byte])

  /** "Video" frame sampling over an opaque binary column: one row per
    * sampled frame — `frameSize` bytes at every `stride` offset, stamped
    * with a fake 25fps presentation time. The flatMap (1→N rows) is the
    * real contract a codec needs; the byte slice stands in for the decoded
    * frame (STUB — no codecs in this environment). Oracle-checked by md5
    * over each emitted frame (t_frame_sample). */
  def frameSample(spark: SparkSession, binDf: DataFrame,
      frameSize: Int = 256, stride: Int = 1024, fps: Int = 25): Dataset[Frame] = {
    import spark.implicits._
    val ptsStepMs = 1000L / fps
    binDf.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = math.ceil(bytes.length / stride.toDouble).toInt
        (0 until n).iterator.map { i =>
          val off = i * stride
          val len = math.min(frameSize, bytes.length - off)
          Frame(id, i, i * ptsStepMs, java.util.Arrays.copyOfRange(bytes, off, off + len))
        }
      }
  }

  case class Resized(doc_id: Long, width: Int, height: Int, thumb: Array[Byte])

  /** STUB resize: keep every `factor`-th byte (the 1-D analog of image
    * downsampling) and scale the fake decoded dims; deterministic so the
    * oracle can recompute the thumbnail md5 (t_resize). */
  def resize(spark: SparkSession, binDf: DataFrame, factor: Int = 4): Dataset[Resized] = {
    import spark.implicits._
    binDf.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, _) = decodeStub(bytes)
          val thumb = Array.tabulate((bytes.length + factor - 1) / factor)(i => bytes(i * factor))
          Resized(id, math.max(1, w / factor), math.max(1, h / factor), thumb)
        }
      }
  }

  /** Per-partition batched metadata extraction over (doc_id, content).
    * One decoder instance per partition (the expensive-init pattern real
    * codecs need), rows streamed through it. */
  def extractMeta(spark: SparkSession, binDf: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    binDf.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real build: open codec/context once per partition here
        rows.map { case (id, bytes) =>
          val (w, h, fmt) = decodeStub(bytes)
          MediaMeta(id, bytes.length.toLong, w, h, fmt)
        }
      }
  }
}
