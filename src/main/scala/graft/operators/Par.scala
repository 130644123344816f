package graft.operators

/** Overlap INDEPENDENT Spark actions from driver threads.
  *
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially (optimization guide §2.6). Gates that land N
  * independent delta/batch directories (different target dirs, no shared
  * state) were paying N × the per-action floor back to back; submitting
  * them from a small thread pool lets each job's tail back-fill the
  * cores the previous job's stragglers freed.
  *
  * Scope rules: callers must pass thunks whose Spark work is genuinely
  * independent (distinct output directories, no ordering contract —
  * [[graft.streaming.DeltaCompact.atomicLandDir]] stages under a UUID,
  * so concurrent landings to different dirs never collide). The pool is
  * per-call and bounded by the thunk count, results return in argument
  * order, and the FIRST failure propagates with its original exception
  * (unwrapped from the executor's ExecutionException). */
object Par {

  def run[A](thunks: (() => A)*): Seq[A] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      thunks.size,
      (r: Runnable) => {
        val t = new Thread(r, "graft-par")
        t.setDaemon(true)
        t
      })
    try {
      val futs = thunks.map(t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        }))
      var firstErr: Throwable = null
      val out = futs.map { f =>
        if (firstErr != null) { f.cancel(true); None }
        else
          try Some(f.get())
          catch {
            case e: java.util.concurrent.ExecutionException =>
              firstErr = Option(e.getCause).getOrElse(e); None
            case e: InterruptedException =>
              Thread.currentThread().interrupt(); firstErr = e; None
          }
      }
      if (firstErr != null) {
        // On a leg failure, do NOT let the surviving legs keep running
        // Spark jobs while the caller unwinds — a gate's cleanup (tmp-dir
        // reap, next fold) could race a still-running write. Cancel the
        // rest, interrupt their threads, and WAIT for them to actually
        // stop before propagating the first failure (bounded: a leg that
        // ignores interrupts for 60 s is left to its daemon thread rather
        // than hanging the caller forever).
        futs.foreach(_.cancel(true))
        pool.shutdownNow()
        pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
        throw firstErr
      }
      out.map(_.get)
    } finally pool.shutdown()
  }

  /** [[run]] for same-typed side-effecting legs. */
  def units(thunks: (() => Unit)*): Unit = { run(thunks: _*); () }
}
