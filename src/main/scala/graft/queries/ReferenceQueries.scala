package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.tables.Tables
import graft.functions.TextFunctions

/** Batch formulations of the reference's DWD/DWS pipelines (SURVEY.md §2),
  * mapped onto the driver's `events`/`documents` tables per FIXTURES.md §8.
  * Streaming twins live in graft.streaming.
  */
object ReferenceQueries {

  private val dec = DecimalType(18, 2)

  /** Dws02 analog (SURVEY A1 + §2.6): 10-minute tumbling event-time window
    * keyed by event_type — pv/uv/value sums with window bounds stamped as
    * stt/edt strings (gmall Dws02TrafficVcChArIsNewPageViewWindow.java:160-203). */
  val a1TrafficWindow: Q = Q(
    "a1_traffic_window",
    run = (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(
          count(lit(1)).as("pv_ct"),
          countDistinct($"user_id").as("uv_ct"),
          sum($"value".cast(dec)).cast("double").as("sum_value"))
        .select(
          date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format($"window.end", "yyyy-MM-dd HH:mm:ss").as("edt"),
          $"event_type", $"pv_ct", $"uv_ct", $"sum_value")
    },
    oracle = Some("""
      SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/600)*600 AS BIGINT)*1000000), '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(make_timestamp((CAST(floor(epoch(ts)/600)*600 AS BIGINT)+600)*1000000), '%Y-%m-%d %H:%M:%S') AS edt,
             event_type,
             COUNT(*) AS pv_ct,
             COUNT(DISTINCT user_id) AS uv_ct,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2, 3"""),
    headline = true)

  /** DwsTrafficKeywordPageViewWindow analog (SURVEY U1/U2/A3): tokenize,
    * explode, count per keyword (LATERAL TABLE(splitfunc) -> explode). */
  val u1KeywordCount: Q = Q(
    "u1_keyword_count",
    run = (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(explode(TextFunctions.tokens($"text")).as("word"))
        .groupBy($"word")
        .agg(count(lit(1)).as("ct"))
    },
    oracle = Some("""
      SELECT word, COUNT(*) AS ct
      FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                      x -> x <> '')) AS word
            FROM documents) t
      GROUP BY word"""))

  /** DwsTrafficKeywordPageViewWindow end-to-end (U1+A3 composite):
    * events broadcast-joined to their document (deterministic doc_id
    * assignment), text tokenized via the native Generator path semantics,
    * exploded, counted per (day, word) — tokenize → window → count, the
    * reference's keyword job shape. */
  val dws01KeywordWindow: Q = Q(
    "dws01_keyword_window",
    run = (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).filter($"event_type" === "view")
        .select($"event_id", $"ts", ($"event_id" % 500).as("doc_id"))
      val docs = Tables.documents(s, dir)
        .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      ev.join(broadcast(docs), "doc_id")
        .select(date_format($"ts", "yyyy-MM-dd").as("dt"), explode($"toks").as("word"))
        .groupBy($"dt", $"word")
        .agg(count(lit(1)).as("ct"))
    },
    oracle = Some("""
      WITH ev AS (SELECT event_id, ts, event_id % 500 AS doc_id FROM events
                  WHERE event_type = 'view'),
      toks AS (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
               FROM documents)
      SELECT strftime(ev.ts, '%Y-%m-%d') AS dt, w.word AS word, COUNT(*) AS ct
      FROM ev JOIN toks ON ev.doc_id = toks.doc_id, unnest(toks.toks) AS w(word)
      GROUP BY 1, 2"""))

  /** U2 with the CJK-bigram fallback mode engaged — the dictionary-free
    * substitute for the reference's IK Chinese analyzer
    * (gmall-realtime-self/.../util/KeywordUtil.java:13-35), golden-pinned
    * on a mixed-script inline fixture (ASCII runs, pure-CJK runs,
    * script boundaries with no whitespace, an isolated ideograph, NULL
    * and empty text). The oracle re-derives every bigram from the SAME
    * two-stage regexp normalization (keep + run-wrap — no lookaround, so
    * RE2 mirrors Java verbatim), certifying the full token multiset. */
  val u2CjkTokens: Q = Q(
    "u2_cjk_tokens",
    run = (s, _) => {
      import s.implicits._
      val fixture = Seq[(Long, String)](
        (1L, "Spark入门指南 v2.0"),
        (2L, "大数据 processing 引擎"),
        (3L, "流处理"),
        (4L, "云"),
        (5L, "hello world"),
        (6L, "价格:100元"),
        (7L, null),
        (8L, ""),
        (9L, "深度学习模型"),
        (10L, "spark引擎fast")).toDF("doc_id", "text")
      fixture
        .select($"doc_id",
          explode(TextFunctions.tokens($"text", cjk = true)).as("token"))
        .groupBy($"doc_id", $"token")
        .agg(count(lit(1)).as("ct"))
    },
    oracle = Some("""
      WITH f(doc_id, text) AS (VALUES
        (1, 'Spark入门指南 v2.0'),
        (2, '大数据 processing 引擎'),
        (3, '流处理'),
        (4, '云'),
        (5, 'hello world'),
        (6, '价格:100元'),
        (7, NULL),
        (8, ''),
        (9, '深度学习模型'),
        (10, 'spark引擎fast')),
      n AS (SELECT doc_id,
              regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9一-鿿]+', ' ', 'g'), '([一-鿿]+)', ' \1 ', 'g') AS s
            FROM f),
      p AS (SELECT doc_id,
              unnest([x for x in regexp_split_to_array(s, ' +') if x <> '']) AS piece
            FROM n),
      t AS (
        SELECT doc_id, piece AS token FROM p
        WHERE NOT regexp_matches(piece, '^[一-鿿]')
        UNION ALL
        SELECT doc_id, piece AS token FROM p
        WHERE regexp_matches(piece, '^[一-鿿]') AND length(piece) = 1
        UNION ALL
        SELECT doc_id,
          unnest([substr(piece, j, 2) for j in range(1, length(piece))]) AS token
        FROM p WHERE regexp_matches(piece, '^[一-鿿]') AND length(piece) >= 2)
      SELECT CAST(doc_id AS BIGINT) AS doc_id, token,
             CAST(COUNT(*) AS BIGINT) AS ct
      FROM t GROUP BY 1, 2"""))

  val all: Seq[Q] = Seq(a1TrafficWindow, u1KeywordCount, dws01KeywordWindow,
    u2CjkTokens)
}
