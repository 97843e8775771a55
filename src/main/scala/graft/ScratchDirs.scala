package graft

/** Per-process scratch allocator for catalog entries that must
  * materialize real files (bucketed upsert state, persisted indexes):
  * fresh subdirs under one PID-scoped root that a JVM shutdown hook
  * deletes — no cross-run collisions (two concurrent verifies never
  * share a path) and no accumulation across rounds (the
  * createTempDirectory-per-run pattern leaked one tree per invocation).
  */
object ScratchDirs {
  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory(
      s"graft_scratch_${ProcessHandle.current().pid()}_")
    sys.addShutdownHook {
      new scala.reflect.io.Directory(r.toFile).deleteRecursively()
    }
    r
  }

  /** A fresh path under the self-cleaning per-process root. */
  def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(root, tag).toString
}
