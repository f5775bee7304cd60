package graft

import java.nio.file.{Files, Path}

/** Session-scoped root for the on-disk stores that lifecycle queries
  * create per run (BM25 segment stores, IVF-PQ index builds, SCD2
  * stores, incremental cluster stores, media-hash stores). One root per
  * JVM under java.io.tmpdir; every store is a subdirectory, and
  * [[deleteAll]] removes the whole root — `graft.Bench` and
  * `graft.Verify` call it on exit, and a shutdown hook backstops every
  * other entrypoint (sbt test, probes) — so consecutive full-catalog
  * runs leave no orphan store directories (round-9 verdict task:
  * temp-store hygiene).
  *
  * Deletion happens after `spark.stop()` / at JVM exit, when no query
  * still reads the stores; a failed delete of an individual file is
  * swallowed (hygiene must never fail a run).
  */
object TempStores {
  @volatile private var rootDir: Path = null
  private var hooked = false

  private def root: Path = synchronized {
    if (rootDir == null) {
      rootDir = Files.createTempDirectory("graft_stores_")
      if (!hooked) {
        hooked = true
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteAll()))
      }
    }
    rootDir
  }

  /** A fresh empty store directory under the session root. */
  def newStore(prefix: String): String = newStorePath(prefix).toString

  /** Path-typed variant (drop-in for `Files.createTempDirectory`) —
    * test suites route their scratch dirs through this so a test-JVM
    * exit sweeps them with the same hook.
    */
  def newStorePath(prefix: String): Path =
    Files.createTempDirectory(root, prefix)

  /** Recursively remove the session root and everything under it.
    * The WHOLE sweep is fail-safe, not just the per-file deletes:
    * `Files.walk` itself can throw mid-traversal (UncheckedIOException
    * if a directory vanishes or turns unreadable), and Bench/Verify call
    * this as the last statement of main — an escaping exception would
    * turn an otherwise-successful run into a nonzero exit. The stream is
    * closed via Using so a partial walk doesn't leak its dir handles.
    */
  def deleteAll(): Unit = synchronized {
    if (rootDir != null && Files.exists(rootDir)) {
      import scala.jdk.CollectionConverters._
      try {
        scala.util.Using(Files.walk(rootDir)) { walk =>
          walk.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala
            .foreach(p => try Files.delete(p) catch { case _: Throwable => () })
        }
      } catch { case _: Throwable => () }
    }
    rootDir = null
  }
}
