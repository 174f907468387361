package graft.queries

/** Per-JVM scratch directories and one-shot builds for graded queries that
  * materialize real tables (bronze layouts, gold aggregates, stream feeds).
  *
  * Paths carry a per-process token so two concurrent gate runs never share
  * a directory, and every path is registered for recursive deletion at JVM
  * exit so repeated gate/bench runs don't accumulate table copies in the
  * tmpdir. Builds latch as done only AFTER completing (inside the lock): a
  * failed or in-flight build must never be served as built.
  */
private[graft] object Scratch {

  private lazy val RunToken: String =
    java.util.UUID.randomUUID().toString.take(8)

  private val dirs =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach(d => rm(new java.io.File(d)))))
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(); ()
  }

  /** A per-(kind, sf-dir, process) scratch path, registered for cleanup. */
  def dir(kind: String, sfDir: String): String = {
    val p = sys.props("java.io.tmpdir") +
      s"/graft_${kind}_${sfDir.hashCode.toHexString}_$RunToken"
    dirs.add(p)
    p
  }

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `build` once per JVM for `key` (a scratch DIRECTORY path);
    * same-key callers wait on a per-key latch — an in-flight multi-minute
    * stream build must not block unrelated keys. Only a COMPLETED build is
    * latched, and a retry after failure starts from a CLEAN directory: a
    * partial first attempt leaves part files, sink output, and streaming
    * checkpoints that would otherwise double-feed the rebuilt stream. */
  def buildOnce(key: String)(build: => Unit): Unit = {
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      if (!built.contains(key)) {
        rm(new java.io.File(key))
        build
        built.add(key)
      }
    }
  }
}
