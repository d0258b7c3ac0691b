package graft.operators

/** JVM-exit cleanup of harness temp directories: ONE shutdown hook
  * draining a queue, however many dirs get registered (r17 ADVICE:
  * `SketchIngest.replayDocs` registered a fresh hook — and parked a
  * thread — per invocation, and bench/scale passes invoke the replay
  * gates dozens of times per JVM; ClusterStore/DedupIndex each carried
  * their own copy of the same per-dir pattern). Registration order is
  * preserved; deletion is best-effort and deepest-first — a file
  * vanishing in the shutdown race with Spark's own hooks must never kill
  * the drain mid-queue. */
object TempDirs {

  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Queue `p` for deletion at JVM exit (the one hook registers itself on
    * first use). Returns `p` for inline wrapping of createTempDirectory. */
  def registerForCleanup(p: java.nio.file.Path): java.nio.file.Path = {
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        var d = dirs.poll()
        while (d != null) { deleteRecursively(d); d = dirs.poll() }
      }, "graft-tempdirs-cleanup"))
    dirs.add(p)
    p
  }

  /** Best-effort recursive delete, usable OUTSIDE shutdown too (e.g.
    * pruning a superseded store generation): swallows non-fatal errors so
    * a locked or vanished file never aborts the remaining deletions. */
  def deleteRecursively(root: java.nio.file.Path): Unit =
    try java.nio.file.Files.walk(root)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    catch { case scala.util.control.NonFatal(_) => () }
}
