package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Video
import graft.tables.Tables

/** Video-arm catalog entries (operators/Video.scala): the engine
  * synthesizes one real MJPEG/AVI per document — a RIFF container
  * (public byte-level spec, written and parsed by the engine's own
  * walker) holding real JPEG frames (encoded and decoded by the JDK's
  * ImageIO codec). Container metadata is pure integer arithmetic over
  * doc_id, so the DuckDB oracle recomputes it exactly; per-frame pixel
  * stats ride the self-validating `ok` bound (JPEG is lossy — the
  * engine computes |decoded mean − formula mean| < 8 integer-exactly
  * and the oracle emits the literal expectation TRUE, the a5_approx_uv
  * pattern), so a hash match certifies every frame of every video
  * decoded within tolerance. Inter-frame codecs (H.264/VP9/AV1) stay
  * honestly stubbed in Multimodal — no JDK decoder exists for them.
  */
object VideoQueries {

  /** Fixture parameter recomposition in DuckDB (Video.synthParams'
    * exact arithmetic). Prefix-style (trailing comma). */
  private def videoCtes(docsRel: String): String = s"""
      vp0 AS (SELECT doc_id, CAST(doc_id % 200 AS BIGINT) AS g FROM $docsRel),
      vpd AS (SELECT doc_id, g,
                     16 * (1 + (g % 4)) AS w,
                     16 * (1 + ((g // 4) % 3)) AS h,
                     2 + (g % 5) AS nf,
                     CASE ((g // 12) % 5) WHEN 0 THEN 10 WHEN 1 THEN 15
                          WHEN 2 THEN 24 WHEN 3 THEN 25 ELSE 30 END AS fps
              FROM vp0),"""

  /** Header-only container metadata: dims / frame count / frame rate /
    * handler straight from the RIFF walk, no JPEG payload touched. The
    * operator cross-checks avih vs strh vs strf vs the movi chunk
    * count and fails loud on disagreement, so the oracle match
    * certifies the writer/parser chain's mutual consistency. n_bytes
    * is API surface but JPEG sizes are encoder detail — excluded. */
  val tVideoMeta: Q = Q(
    "t_video_meta",
    run = (s, dir) =>
      Video.videoMeta(s, Video.synthesize(s, Tables.documents(s, dir)))
        .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
          col("us_per_frame"), col("fps"), col("format"), col("n_streams")),
    oracle = Some(s"""
      WITH ${videoCtes("documents")}
      final AS (
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(nf AS BIGINT) AS n_frames,
               CAST(1000000 // fps AS BIGINT) AS us_per_frame,
               CAST(fps AS BIGINT) AS fps, 'mjpg' AS format,
               CAST(1 AS BIGINT) AS n_streams
        FROM vpd)
      SELECT * FROM final"""))

  /** REAL per-frame decode over every video: exact container fields
    * plus the JPEG tolerance gate — ok ⟺ |sum_lum − formula sum| <
    * 8·n_px, engine-computed integer-exactly against the fixture
    * formula's exact sum (Video.synthFrameSum, the oracle's twin);
    * the oracle recomputes the exact fields and emits ok = TRUE. A
    * hash match therefore proves every frame decoded, with the right
    * dims, within the luminance bound. */
  val tVideoFrames: Q = Q(
    "t_video_frames",
    run = (s, dir) => {
      import s.implicits._
      val frames = Video.frameTable(s, Video.synthesize(s, Tables.documents(s, dir)))
      val expected = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val n = Video.synthParams(id)._3
          (0 until n).iterator.map(f => (id, f, Video.synthFrameSum(id, f)))
        }
        .toDF("doc_id", "frame_idx", "expected_sum")
      frames.join(expected, Seq("doc_id", "frame_idx"))
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("n_px"),
          (abs(col("sum_lum") - col("expected_sum")) < lit(8) * col("n_px"))
            .as("ok"))
    },
    oracle = Some(s"""
      WITH ${videoCtes("documents")}
      vfr AS (SELECT doc_id, w, h, CAST(unnest(range(0, nf)) AS INT) AS frame_idx
              FROM vpd)
      SELECT doc_id, frame_idx, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             CAST(w * h AS BIGINT) AS n_px, TRUE AS ok
      FROM vfr"""))

  /** Frame sampling that decodes ONLY the sampled frames (every 2nd,
    * frame 0 included), each stamped with its exact presentation time
    * frame_idx · usPerFrame — all integer-exact except the same JPEG
    * tolerance gate. The unsampled payloads are never read. */
  val tVideoSample: Q = Q(
    "t_video_sample",
    run = (s, dir) => {
      import s.implicits._
      val sampled = Video.sampleFrames(s, Video.synthesize(s, Tables.documents(s, dir)),
        stride = 2)
      val expected = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val n = Video.synthParams(id)._3
          (0 until n by 2).iterator.map(f => (id, f, Video.synthFrameSum(id, f)))
        }
        .toDF("doc_id", "frame_idx", "expected_sum")
      sampled.join(expected, Seq("doc_id", "frame_idx"))
        .select(col("doc_id"), col("frame_idx"), col("pts_us"), col("width"),
          col("height"),
          (abs(col("sum_lum") - col("expected_sum")) < lit(8) * col("n_px"))
            .as("ok"))
    },
    oracle = Some(s"""
      WITH ${videoCtes("documents")}
      vfr AS (SELECT doc_id, w, h, fps,
                     CAST(unnest(range(0, nf, 2)) AS INT) AS frame_idx
              FROM vpd)
      SELECT doc_id, frame_idx,
             CAST(frame_idx * (1000000 // fps) AS BIGINT) AS pts_us,
             CAST(w AS INT) AS width, CAST(h AS INT) AS height, TRUE AS ok
      FROM vfr"""))

  /** Video near-dup removal via keyframe perceptual hashing (decode
    * ONLY frame 0 per video, aHash it, elect keepers through the
    * shared Fingerprints machinery at hamming 0 — exact keyframe
    * duplicates). The fixture's frame formula depends on the group
    * alone, so same-group videos are byte-identical and their decoded
    * keyframes hash EQUAL deterministically (JPEG decode is
    * deterministic); the oracle predicts the keeper set structurally —
    * keep ⟺ doc_id is its group's minimum, i.e. doc_id = doc_id % 200
    * on the contiguous-id corpus — so a hash match certifies
    * cross-partition byte determinism of the whole synthesize → parse →
    * JPEG-decode → hash chain PLUS the keeper election (and would fail
    * loudly on any cross-group 64-bit hash collision). The hash VALUE
    * itself is JPEG-decoder-dependent and deliberately projected away. */
  val tVideoDedupKeyframe: Q = Q(
    "t_video_dedup_keyframe",
    run = (s, dir) =>
      Video.nearDupKeepers(s,
        Video.synthesize(s, Tables.documents(s, dir)), maxHamming = 0)
        .select(col("doc_id"), col("keep")),
    oracle = Some("""
      SELECT doc_id, (doc_id = doc_id % 200) AS keep FROM documents"""))

  val all: Seq[Q] = Seq(tVideoMeta, tVideoFrames, tVideoSample,
    tVideoDedupKeyframe)
}
