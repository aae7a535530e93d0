package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

/** Temp staging directories that must not outlive the JVM: each query
  * invocation of the resumable cleaning chain stages to a fresh dir (so
  * a timed re-run does the full work, not a resume). `scoped` registers
  * one JVM shutdown hook that deletes everything handed out — a CRASH
  * BACKSTOP, not the primary cleanup: within one long-lived session the
  * hook never fires, so callers delete their dir themselves as soon as
  * its contents are no longer referenced (kg19 does, after eagerly
  * materializing its final aggregate — ADVICE r6). */
object TempDirs {

  private val dirs = new ConcurrentLinkedQueue[Path]()
  private val hooked = new AtomicBoolean(false)

  def scoped(prefix: String): String = {
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        dirs.forEach(p => deleteRecursively(p.toString))))
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  def deleteRecursively(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    if (!Files.exists(root)) return
    Files.walk(root).iterator().asScala.toSeq.reverseIterator
      .foreach(p => try Files.delete(p) catch { case _: Exception => () })
  }
}
