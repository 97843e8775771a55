package graft.queries

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

  val all: Seq[Q] = Seq(tCurateMedia, tCurateMedia3, tVideoDemuxAudio,
    tVideoDemuxSubs)
}
