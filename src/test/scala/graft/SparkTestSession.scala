package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local("graft-test", Some("4"))
  val sf0001 = "/root/testdata/sf0.001"

  /** A fresh scratch path under the self-cleaning per-process root
    * (graft.ScratchDirs — ONE lifecycle implementation, not a test-side
    * copy). Specs MUST use this instead of a bare createTempDirectory,
    * which leaked hundreds of graft_bu_*-style trees into /tmp per test
    * run — the same hazard class as the t_search_indexed leak. */
  def scratch(tag: String): String = ScratchDirs.fresh(tag)
}
