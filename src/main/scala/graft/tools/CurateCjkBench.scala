package graft.tools

import org.apache.spark.sql.functions._

/** End-to-end cost of the curation cjk MODE at bench scale (verdict r9
  * #6): run the full Curate.runDocs chain over the same corpus twice —
  * latin mode and cjk mode — in one session and print both wall times,
  * so SCALE.md can record the mode's end-to-end price as a measured fact
  * next to the CjkTokenizeBench microbench (which times the tokenizer
  * kernel alone). The corpus is the sf1 replicated fixture
  * (tools/make_sf1.py); on it the two modes do identical near-dup work
  * on identical token streams (zero CJK in the driver corpus — latin
  * runs tokenize identically under both tokenizers), so the delta IS the
  * mode's overhead: the fused CJK tokenizer scan plus the zh-extended
  * stop set.
  *
  * Usage: tools/run_main.sh graft.tools.CurateCjkBench [sfDir] [runs]
  */
object CurateCjkBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local("curate-cjk-bench",
      Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).persist()
    docs.count()
    def timed(tag: String, cjk: Boolean): Unit = (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      val (_, st) = graft.pipeline.Curate.runDocs(spark, docs, cjk = cjk)
      graft.pipeline.Curate.releaseCaches(spark)
      println(f"[$tag run$r] ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"(input ${st.input} kept ${st.kept} near ${st.nearDups})")
    }
    timed("latin", cjk = false)
    timed("cjk", cjk = true)
    spark.stop()
  }
}
