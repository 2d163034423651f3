package graft

import java.nio.file.{Files, Path}

/** Process-scoped scratch directories for queries that need a local
  * sink (format round-trips, streaming checkpoints, session memos):
  * every dir created here is deleted recursively by ONE JVM shutdown
  * hook, so repeated Verify/Bench/test runs don't accumulate copies of
  * table data in the temp filesystem (each Verify run previously
  * leaked ORC+CSV+JSON copies of `customer` per q81 invocation).
  */
object TempDirs {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { root =>
        try {
          val walk = Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => try Files.delete(p) catch { case _: Exception => })
          finally walk.close()
        } catch { case _: Exception => } // best-effort: never block exit
      }
    }, "graft-tempdir-cleanup"))

  /** A fresh temp directory cleaned up at JVM exit. */
  def scoped(prefix: String): String = {
    hookInstalled
    val d = Files.createTempDirectory(prefix)
    created.add(d)
    d.toString
  }
}
