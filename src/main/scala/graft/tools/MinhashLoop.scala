package graft.tools

/** Local profiling driver: run the t_dedup_minhash headline in a loop so
  * jstack/async sampling can attribute its cost (see SCALE.md round-8
  * notes; not part of the driver contract). */
object MinhashLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("graft-minhash-loop", Some("32"))
    val fn = graft.SparkEntry.queries("t_dedup_minhash")
    for (i <- 1 to 12) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.pipeline.Curate.releaseCaches(spark)
    }
    spark.stop()
  }
}
