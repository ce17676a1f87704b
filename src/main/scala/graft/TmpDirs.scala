package graft

import java.nio.file.{Files, Path}

/** Temp-directory lifecycle for operators that materialize intermediate
  * layouts (bucketed tables, LSH index files, streaming checkpoints/sinks).
  *
  * `File.deleteOnExit` cannot remove a non-empty directory, so a dir that a
  * writer fills after registration silently leaks — every dir created here
  * is instead tracked by ONE JVM shutdown hook that deletes the registered
  * trees bottom-up (walk stream closed, failures swallowed: cleanup must
  * never mask the real exit path).
  */
object TmpDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  // Lazily install exactly one hook for the whole JVM, however many dirs
  // are registered (the previous per-call-site hooks each spawned a thread).
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { p =>
        try if (Files.exists(p)) {
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(q => Files.deleteIfExists(q))
          finally walk.close()
        } catch { case _: Throwable => () }
      }
    }))

  /** Create a temp directory that is removed recursively at JVM exit. */
  def create(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  /** md5 hex digest of a UTF-8 string — the shared cache-key/table-tag
    * idiom (SccJsonSource cache keys, Relational bucketed-table tags);
    * one definition so the two can never silently diverge. */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
