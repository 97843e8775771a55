package graft.tools

import org.apache.spark.sql.functions._

/** Micro-bench: fused tokenize_array_cjk vs the compositional
  * tokens(text, cjk=true) chain over a synthetic mixed-script corpus —
  * the measurement behind swapping the fused kernel into the curation
  * cjk mode. Usage: run_main.sh graft.tools.CjkTokenizeBench [rows]
  */
object CjkTokenizeBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("cjk-tokenize-bench",
      Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    val rows = args.headOption.map(_.toInt).getOrElse(2000000)
    val zh = "我们可以一起去没有什么问题他们说这是一个很好的办法"
    val docs = spark.range(rows)
      .select(col("id"),
        concat(lit(zh), lit(" spark batch "), col("id").cast("string"),
          lit(" 数据仓库流处理引擎 row filter")).as("text"))
      .persist()
    docs.count()
    def timed(tag: String)(c: org.apache.spark.sql.Column): Unit = {
      // count the total token mass so the whole array materializes
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        val m = docs.select(sum(size(c)).as("m")).first().getLong(0)
        println(f"[$tag run$r] ${(System.nanoTime() - t0) / 1e9}%.2fs (mass $m)")
      }
    }
    timed("compositional")(graft.functions.TextFunctions
      .tokens(coalesce(col("text"), lit("")), cjk = true))
    timed("fused")(graft.functions.TextFunctions.tokensFusedCjk(col("text")))
    spark.stop()
  }
}
