package graft

/** Plan inspector: prints the formatted physical plan and noop-execution
  * time for one catalog query. Usage: Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("graft-explain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name executed in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
