package graft

import java.nio.file.{Files, Path}

/** Scratch directories for queries that persist intermediate state (index
  * stores, stream checkpoints): created under the system temp root and
  * removed on JVM exit, so repeated harness runs don't accumulate garbage.
  */
object Scratch {

  // one shutdown hook draining a shared list — per-dir hooks would
  // accumulate a thread per created directory over a long-lived JVM
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[Path]
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var p = pending.poll()
    while (p != null) { deleteRecursively(p); p = pending.poll() }
  }))

  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    pending.add(p)
    p.toString
  }

  private val stables =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** A STABLE scratch dir per name: the same name returns the same
    * directory for the JVM's lifetime (still temp-rooted, still
    * removed on exit). For standing stores rebuilt on cache miss —
    * a bounded-cache eviction must find the already-committed store
    * again instead of seeding a fresh root that accumulates on disk.
    */
  def stable(name: String): String =
    stables.computeIfAbsent(name, n => dir(n))

  private def deleteRecursively(root: Path): Unit = {
    if (!Files.exists(root)) return
    val stream = Files.walk(root)
    try stream.sorted(java.util.Comparator.reverseOrder()).forEach { p =>
      try Files.delete(p) catch { case _: Exception => () }
    } finally stream.close()
  }
}
