package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local("graft-test", Some("4"))
  val sf0001 = "/root/testdata/sf0.001"

  /** Per-process scratch root, deleted on JVM exit — specs that need a
    * fresh throwaway path MUST use this instead of a bare
    * createTempDirectory (which leaked hundreds of graft_bu_* and
    * graft_search_spec* trees into /tmp per test run, the same hazard
    * class as the t_search_indexed leak fixed in round 7/9). */
  private lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory(
      s"graft_test_scratch_${ProcessHandle.current().pid()}_")
    sys.addShutdownHook {
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
    root
  }

  /** A fresh scratch path under the self-cleaning root. */
  def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, tag).toString
}
