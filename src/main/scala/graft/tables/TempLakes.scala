package graft.tables

import java.nio.file.{Files, Path}

/** Temp-directory hygiene for queries that materialize a throwaway lake
  * (the ingest twin, the serve/append/drift/report rows): every directory
  * created here is registered for RECURSIVE deletion at JVM exit, so a day
  * of repeated Verify/Bench/test runs does not silt the temp filesystem.
  * This is not cosmetic — ~2,000 leftover lake dirs (≈550 MB) measured a
  * 30% suite-wide bench inflation (directory churn + page-cache pollution
  * on every lake-based row) that vanished when they were removed.
  *
  * Deletion happens at exit, not per-query, because the returned
  * DataFrames read FROM the temp lake lazily — the harness's action runs
  * after the query function returns. `File.deleteOnExit` cannot do this
  * (it refuses non-empty directories); the shutdown hook walks each tree
  * deepest-first and ignores races (a dir already gone is success). */
object TempLakes {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { p =>
        try {
          if (Files.exists(p)) {
            val walk = Files.walk(p)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => { try Files.deleteIfExists(f) catch { case _: Throwable => () }; () })
            finally walk.close()
          }
        } catch { case _: Throwable => () }
      }
    }))

  /** Create a temp directory that dies with the JVM. */
  def create(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p): Unit
    p.toString
  }
}
