package graft

/** Per-JVM scratch space for anything a query must write to disk but
  * that must not outlive the process (IO round-trip dirs, streaming
  * checkpoints). The returned DataFrames read/recover from these paths
  * lazily, so the files must survive the query closure — one temp root
  * per JVM, removed by a shutdown hook, keeps repeated bench/verify
  * runs from accumulating garbage.
  */
object Scratch {
  private val counter = new java.util.concurrent.atomic.AtomicInteger

  def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.delete(q))
    }

  lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-scratch")
    sys.addShutdownHook(deleteTree(p))
    p
  }

  /** A fresh `tag`-prefixed subdir under the per-JVM root. */
  def dir(tag: String): String =
    java.nio.file.Files.createDirectories(
      root.resolve(s"$tag-${counter.incrementAndGet()}")).toString
}
