package graft.queries

import org.apache.spark.sql.functions.col

import graft.operators.{Audio, Images}
import graft.tables.Tables

/** Cross-modal catalog entries: compositions that span more than one
  * media arm. */
object MediaQueries {

  /** Cross-modal curation (pipeline/MediaCurate.curateMedia): a
    * document survives a multimodal corpus only if EVERY modality
    * keeps it. The engine runs BOTH full per-modality pipelines (each
    * with its own gate chain + keeper dedup among survivors) and joins
    * the verdicts; the oracle recomposes BOTH pipelines — the image
    * CTE chain AND the audio CTE chain, gates, precedence, and both
    * survivor-keeper elections — in ONE DuckDB statement, so the hash
    * match certifies the cross-modal composition end to end. */
  val tCurateMedia: Q = Q(
    "t_curate_media",
    run = (s, dir) =>
      graft.pipeline.MediaCurate.curateMedia(s,
        Images.synthesize(s, Tables.documents(s, dir)),
        Audio.synthesize(s, Tables.documents(s, dir))),
    oracle = Some(s"""
      WITH ${ImageQueries.imageCtes("documents")}
      ${AudioQueries.audioCtes("documents").stripPrefix("\n")}
      ilbl AS (SELECT s.doc_id, a.ahash,
                      (s.n_px < 128) AS undersized,
                      (s.max_lum - s.min_lum < 16) AS flat,
                      (s.sum_lum < 120 * s.n_px OR s.sum_lum > 136 * s.n_px)
                        AS brightness
               FROM ist s JOIN iah a USING (doc_id)),
      isurv AS (SELECT doc_id, ahash FROM ilbl
                WHERE NOT undersized AND NOT flat AND NOT brightness),
      imh AS (SELECT ahash, MIN(doc_id) AS min_doc FROM isurv GROUP BY 1),
      inbm AS (SELECT a.ahash AS ha, MIN(b.min_doc) AS m
               FROM imh a JOIN imh b ON bit_count(xor(a.ahash, b.ahash)) <= 3
               GROUP BY 1),
      ireason AS (SELECT l.doc_id,
                         CASE WHEN l.undersized THEN 'undersized'
                              WHEN l.flat THEN 'flat'
                              WHEN l.brightness THEN 'brightness'
                              WHEN l.doc_id <> n.m THEN 'near_dup'
                              ELSE 'kept' END AS image_reason
                  FROM ilbl l LEFT JOIN inbm n ON l.ahash = n.ha),
      aprof AS (SELECT doc_id, COUNT(*) AS n,
                       SUM(CASE WHEN abs(s) >= 32700 THEN 1 ELSE 0 END) AS clip,
                       SUM(CASE WHEN abs(s) < 256 THEN 1 ELSE 0 END) AS sil
                FROM asx GROUP BY 1),
      albl AS (SELECT p.doc_id, f.afp,
                      (p.n < 512) AS too_short,
                      (p.clip * 256 > p.n) AS clipped,
                      (p.sil * 64 > p.n) AS silent
               FROM aprof p JOIN afh f USING (doc_id)),
      asurv AS (SELECT doc_id, afp FROM albl
                WHERE NOT too_short AND NOT clipped AND NOT silent),
      amh AS (SELECT afp, MIN(doc_id) AS min_doc FROM asurv GROUP BY 1),
      anbm AS (SELECT a.afp AS ha, MIN(b.min_doc) AS m
               FROM amh a JOIN amh b ON bit_count(xor(a.afp, b.afp)) <= 3
               GROUP BY 1),
      areason AS (SELECT l.doc_id,
                         CASE WHEN l.too_short THEN 'too_short'
                              WHEN l.clipped THEN 'clipped'
                              WHEN l.silent THEN 'silent'
                              WHEN l.doc_id <> n.m THEN 'near_dup'
                              ELSE 'kept' END AS audio_reason
                  FROM albl l LEFT JOIN anbm n ON l.afp = n.ha)
      SELECT i.doc_id, i.image_reason, a.audio_reason,
             CASE WHEN i.image_reason <> 'kept'
                    THEN 'image:' || i.image_reason
                  WHEN a.audio_reason <> 'kept'
                    THEN 'audio:' || a.audio_reason
                  ELSE 'kept' END AS drop_reason
      FROM ireason i JOIN areason a USING (doc_id)"""))

  /** THREE-modality curation (MediaCurate.curateMedia3): image + audio
    * + video verdicts full-outer-joined, precedence image → audio →
    * video. The oracle recomposes ALL THREE pipelines — both decode-
    * level CTE chains (image pixels, audio samples) plus the video
    * header-parameter chain with its structural keeper rule — in ONE
    * DuckDB statement; the fixture synthesizes every modality for
    * every doc, so the missing_modality arm cannot fire here and is
    * pinned on disjoint id sets in MediaCurateSpec instead. */
  val tCurateMedia3: Q = Q(
    "t_curate_media3",
    run = (s, dir) =>
      graft.pipeline.MediaCurate.curateMedia3(s,
        Images.synthesize(s, Tables.documents(s, dir)),
        Audio.synthesize(s, Tables.documents(s, dir)),
        graft.operators.Video.synthesize(s, Tables.documents(s, dir))),
    oracle = Some(s"""
      WITH ${ImageQueries.imageCtes("documents")}
      ${AudioQueries.audioCtes("documents").stripPrefix("\n")}
      ${VideoQueries.videoCtes("documents").stripPrefix("\n")}
      ilbl AS (SELECT s.doc_id, a.ahash,
                      (s.n_px < 128) AS undersized,
                      (s.max_lum - s.min_lum < 16) AS flat,
                      (s.sum_lum < 120 * s.n_px OR s.sum_lum > 136 * s.n_px)
                        AS brightness
               FROM ist s JOIN iah a USING (doc_id)),
      isurv AS (SELECT doc_id, ahash FROM ilbl
                WHERE NOT undersized AND NOT flat AND NOT brightness),
      imh AS (SELECT ahash, MIN(doc_id) AS min_doc FROM isurv GROUP BY 1),
      inbm AS (SELECT a.ahash AS ha, MIN(b.min_doc) AS m
               FROM imh a JOIN imh b ON bit_count(xor(a.ahash, b.ahash)) <= 3
               GROUP BY 1),
      ireason AS (SELECT l.doc_id,
                         CASE WHEN l.undersized THEN 'undersized'
                              WHEN l.flat THEN 'flat'
                              WHEN l.brightness THEN 'brightness'
                              WHEN l.doc_id <> n.m THEN 'near_dup'
                              ELSE 'kept' END AS image_reason
                  FROM ilbl l LEFT JOIN inbm n ON l.ahash = n.ha),
      aprof AS (SELECT doc_id, COUNT(*) AS n,
                       SUM(CASE WHEN abs(s) >= 32700 THEN 1 ELSE 0 END) AS clip,
                       SUM(CASE WHEN abs(s) < 256 THEN 1 ELSE 0 END) AS sil
                FROM asx GROUP BY 1),
      albl AS (SELECT p.doc_id, f.afp,
                      (p.n < 512) AS too_short,
                      (p.clip * 256 > p.n) AS clipped,
                      (p.sil * 64 > p.n) AS silent
               FROM aprof p JOIN afh f USING (doc_id)),
      asurv AS (SELECT doc_id, afp FROM albl
                WHERE NOT too_short AND NOT clipped AND NOT silent),
      amh AS (SELECT afp, MIN(doc_id) AS min_doc FROM asurv GROUP BY 1),
      anbm AS (SELECT a.afp AS ha, MIN(b.min_doc) AS m
               FROM amh a JOIN amh b ON bit_count(xor(a.afp, b.afp)) <= 3
               GROUP BY 1),
      areason AS (SELECT l.doc_id,
                         CASE WHEN l.too_short THEN 'too_short'
                              WHEN l.clipped THEN 'clipped'
                              WHEN l.silent THEN 'silent'
                              WHEN l.doc_id <> n.m THEN 'near_dup'
                              ELSE 'kept' END AS audio_reason
                  FROM albl l LEFT JOIN anbm n ON l.afp = n.ha),
      vreason AS (SELECT doc_id,
                         CASE WHEN w * h < 512 THEN 'undersized'
                              WHEN nf < 3 THEN 'too_few_frames'
                              WHEN fps < 12 OR fps > 60 THEN 'bad_fps'
                              WHEN doc_id <> doc_id % 200 THEN 'near_dup'
                              ELSE 'kept' END AS video_reason
                  FROM vpd)
      SELECT i.doc_id, i.image_reason, a.audio_reason, v.video_reason,
             CASE WHEN i.image_reason <> 'kept'
                    THEN 'image:' || i.image_reason
                  WHEN a.audio_reason <> 'kept'
                    THEN 'audio:' || a.audio_reason
                  WHEN v.video_reason <> 'kept'
                    THEN 'video:' || v.video_reason
                  ELSE 'kept' END AS drop_reason
      FROM ireason i JOIN areason a USING (doc_id)
                     JOIN vreason v USING (doc_id)"""))

  /** A/V DEMUX certified end to end (Video.synthesizeAV →
    * Video.extractAudioTrack → Audio.audioStats): the fixture muxes
    * the AUDIO ARM'S sample formula into stream 1 of a two-stream
    * MJPEG AVI ('01wb' PCM chunks, WAVEFORMATEX strf, standard
    * interleaved layout), the engine demuxes it back to a WAVE clip
    * and runs the REAL javax.sound decode + stats + fingerprint pass —
    * and the oracle is t_audio_meta's CTE chain verbatim (format
    * literal 'wave': the demuxer re-encodes WAVE). A hash match proves
    * mux → container walk → chunk concatenation → sample decode →
    * re-encode → decode → stats/fingerprint bit-for-bit against the
    * same formula the direct audio arm is certified by. */
  val tVideoDemuxAudio: Q = Q(
    "t_video_demux_audio",
    run = (s, dir) =>
      Audio.audioStats(s,
        graft.operators.Video.extractAudioTrack(s,
          graft.operators.Video.synthesizeAV(s, Tables.documents(s, dir)))),
    oracle = Some(s"""
      WITH ${AudioQueries.audioCtes("documents")}
      final AS (
        SELECT d.doc_id, 'wave' AS format, CAST(d.rate AS INT) AS sample_rate,
               CAST(t.n_samples AS BIGINT) AS n_samples,
               CAST(t.sum_amp AS BIGINT) AS sum_amp,
               CAST(t.min_amp AS INT) AS min_amp, CAST(t.max_amp AS INT) AS max_amp,
               CAST(t.energy AS BIGINT) AS energy,
               CAST(z.zero_cross AS BIGINT) AS zero_cross, f.afp
        FROM apd d JOIN ast t USING (doc_id) JOIN azc z USING (doc_id)
             JOIN afh f USING (doc_id))
      SELECT * FROM final"""))

  /** SUBTITLE DEMUX (Video.synthesizeAVT → Video.extractSubtitles):
    * the fixture muxes one UTF-8 caption per frame into a third 'txts'
    * stream (interleaved text chunks, the transcript shape) and the
    * engine extracts them back in container order; the oracle rebuilds
    * every caption string from the formula — string equality through
    * the hash compare certifies the mux → walk → chunk slice → UTF-8
    * decode chain byte-for-byte, including odd-length chunk padding
    * (the CJK char makes byte lengths vary). The extracted frame feeds
    * the TEXT pipeline unchanged, which is the point of the op. */
  val tVideoDemuxSubs: Q = Q(
    "t_video_demux_subs",
    run = (s, dir) =>
      graft.operators.Video.extractSubtitles(s,
        graft.operators.Video.synthesizeAVT(s, Tables.documents(s, dir))),
    oracle = Some("""
      WITH vt0 AS (SELECT doc_id, CAST(doc_id % 200 AS BIGINT) AS g
                   FROM documents),
      vtp AS (SELECT doc_id, g, 2 + (g % 5) AS nf FROM vt0),
      vtf AS (SELECT doc_id, g, CAST(unnest(range(0, nf)) AS INT) AS frame_idx
              FROM vtp)
      SELECT doc_id, frame_idx,
             'cap g=' || CAST(g AS VARCHAR) || ' f=' ||
               CAST(frame_idx AS VARCHAR) || ' 字' AS text
      FROM vtf"""))

  /** FRAME EXPORT certified through the IMAGE arm (Video.exportFrames
    * → Images.imageStats): every 2nd frame of every uncompressed video
    * becomes a standalone PNG, re-keyed doc_id·10 + frame_idx (the
    * fixture's nf ≤ 6 < 10), and the image arm's full decode + stats +
    * aHash runs on the exports; the oracle recomputes EVERYTHING —
    * dims, integer stats, all 64 aHash bits — from the video pixel
    * formula (the iah idiom with the frame term folded in). A hash
    * match certifies raw-frame decode → PNG encode → ImageIO re-decode
    * → stats/hash bit-for-bit, i.e. the video→image corpus hop is
    * lossless end to end. */
  val tVideoFrameExport: Q = Q(
    "t_video_frame_export",
    run = (s, dir) => {
      val frames = graft.operators.Video.exportFrames(s,
        graft.operators.Video.synthesizeRaw(s, Tables.documents(s, dir)),
        stride = 2)
      Images.imageStats(s,
        frames.select((col("doc_id") * 10 + col("frame_idx")).as("doc_id"),
          col("img")))
    },
    oracle = Some(s"""
      WITH ${VideoQueries.videoCtes("documents")}
      vfr AS (SELECT doc_id, g, w, h,
                     CAST(unnest(range(0, nf, 2)) AS INT) AS frame_idx FROM vpd),
      vk AS (SELECT doc_id * 10 + frame_idx AS key, g, w, h, frame_idx FROM vfr),
      vxx AS (SELECT key, g, w, h, frame_idx, unnest(range(0, w)) AS x FROM vk),
      vxy AS (SELECT key, g, w, h, frame_idx, x, unnest(range(0, h)) AS y
              FROM vxx),
      vpx AS (SELECT key, w, h, x, y,
                     (x*2654435761 + y*40503 + (x+3)*(y+7)*(g+13)
                      + frame_idx*7919*(x+y+1) + g*2246822519) % 256 AS lum
              FROM vxy),
      vst AS (SELECT key, SUM(lum) AS sum_lum, MIN(lum) AS min_lum,
                     MAX(lum) AS max_lum, COUNT(*) AS n_px FROM vpx GROUP BY 1),
      vbk AS (SELECT key, (y*8)//h AS bi, (x*8)//w AS bj,
                     SUM(lum) AS bs, COUNT(*) AS area
              FROM vpx GROUP BY 1, 2, 3),
      vbt AS (SELECT b.key, CAST(b.bi*8 + b.bj AS INT) AS k,
                     CASE WHEN b.bs * s.n_px > s.sum_lum * b.area
                          THEN 1 ELSE 0 END AS bit
              FROM vbk b JOIN vst s USING (key)),
      vah AS (SELECT key,
                     CAST(COALESCE(SUM(CASE WHEN k < 63 AND bit = 1
                            THEN (CAST(1 AS BIGINT) << k) ELSE 0 END), 0) AS BIGINT)
                     + CASE WHEN COALESCE(MAX(CASE WHEN k = 63 THEN bit END), 0) = 1
                            THEN CAST(-9223372036854775808 AS BIGINT)
                            ELSE 0 END AS ahash
              FROM vbt GROUP BY 1)
      SELECT d.key AS doc_id, CAST(d.w AS INT) AS width,
             CAST(d.h AS INT) AS height, 'png' AS format,
             CAST(s.n_px AS BIGINT) AS n_px, CAST(s.sum_lum AS BIGINT) AS sum_lum,
             CAST(s.min_lum AS INT) AS min_lum, CAST(s.max_lum AS INT) AS max_lum,
             a.ahash
      FROM vk d JOIN vst s USING (key) JOIN vah a USING (key)"""))

  val all: Seq[Q] = Seq(tCurateMedia, tCurateMedia3, tVideoDemuxAudio,
    tVideoDemuxSubs, tVideoFrameExport)
}
