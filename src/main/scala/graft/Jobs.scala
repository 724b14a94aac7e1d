package graft

/** Concurrent submission of INDEPENDENT Spark actions — guide §2.6
  * ("Overlap independent jobs"): Spark's scheduler happily runs
  * several jobs at once inside one application; actions are only
  * sequential because driver code calls them sequentially. The staged
  * store writers (merge/compact commit blocks) emit 4-6 independent
  * relation writes whose stages otherwise serialize end-to-end — at
  * bench SF each is a chain of small barriers (wall ≈ Σ stages), and
  * at 100 TB each write's straggler tail leaves the cluster idle
  * until the next write starts. Submitting them together lets the
  * next write's tasks back-fill executors freed by the current
  * write's tail, at ANY scale (FIFO scheduling gives exactly the
  * back-fill behavior; see the guide's worked ThreadPool example).
  *
  * Threads are created per call (not pooled) so Spark's
  * InheritableThreadLocal job properties — job group, description,
  * the AQE/session conf snapshot captured at Dataset creation — are
  * inherited from the calling thread, keeping UI labels and
  * cancellation correct. All thunks run to completion even when one
  * fails (a half-written staging dir is swept by the commit protocol
  * either way); the FIRST failure rethrows to the caller.
  *
  * Thread-safety note: thunks may share upstream lineage-cut
  * relations (lazy localCheckpoints). Concurrent first-consumption is
  * safe — RDDCheckpointData's state machine is synchronized and
  * idempotent, block-store puts are idempotent, and the scheduler is
  * documented fully thread-safe; the worst case is one partition
  * computed twice before its block registers. */
object Jobs {
  def inParallel(thunks: Seq[() => Unit]): Unit = {
    if (thunks.size <= 1) { thunks.foreach(_.apply()); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(
        () => try t() catch { case e: Throwable => errs.add(e); () },
        s"graft-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }
}
