package graft.queries

import graft.plans.GraftFunctions
import graft.tables.Tables

/** SQL-surface parity (the reference's Flink SQL jobs run as spark.sql):
  * LATERAL VIEW over the native tokenize Generator, and the SQL tumble
  * window. Same oracles as the DataFrame forms — the two surfaces must
  * agree.
  */
object SqlQueries {

  /** U1 via SQL LATERAL VIEW + custom Catalyst Generator (exact shape of
    * the reference's `LATERAL TABLE(splitfunc(item_word))`). */
  val u1SqlLateral: Q = Q(
    "u1_sql_lateral",
    run = (s, dir) => {
      GraftFunctions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("documents_v")
      s.sql("""
        SELECT word, COUNT(*) AS ct
        FROM documents_v LATERAL VIEW tokenize(text) t AS word
        GROUP BY word""")
    },
    oracle = Some("""
      SELECT word, COUNT(*) AS ct
      FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                      x -> x <> '')) AS word
            FROM documents) t
      GROUP BY word"""))

  /** A3: the SQL tumble-window count
    * (DwsTrafficKeywordPageViewWindow.java:103-111 TUMBLE ≈ window()). */
  val a3SqlTumble: Q = Q(
    "a3_sql_tumble",
    run = (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_v")
      s.sql("""
        SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS stt,
               date_format(window.end, 'yyyy-MM-dd HH:mm:ss') AS edt,
               event_type, COUNT(*) AS ct
        FROM events_v
        GROUP BY window(ts, '10 minutes'), event_type""")
    },
    oracle = Some("""
      SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/600)*600 AS BIGINT)*1000000), '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(make_timestamp((CAST(floor(epoch(ts)/600)*600 AS BIGINT)+600)*1000000), '%Y-%m-%d %H:%M:%S') AS edt,
             event_type, COUNT(*) AS ct
      FROM events GROUP BY 1, 2, 3"""))

  val all: Seq[Q] = Seq(u1SqlLateral, a3SqlTumble)
}
