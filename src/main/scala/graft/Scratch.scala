package graft

import java.nio.file.{Files, Path}

/** Scratch directories for queries that persist intermediate state (index
  * stores, stream checkpoints): created under the system temp root and
  * removed on JVM exit, so repeated harness runs don't accumulate garbage.
  */
object Scratch {

  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p.toString
  }

  private def deleteRecursively(root: Path): Unit = {
    if (!Files.exists(root)) return
    val stream = Files.walk(root)
    try stream.sorted(java.util.Comparator.reverseOrder()).forEach { p =>
      try Files.delete(p) catch { case _: Exception => () }
    } finally stream.close()
  }
}
