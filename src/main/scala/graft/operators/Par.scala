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
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }

  /** [[run]] for same-typed side-effecting legs. */
  def units(thunks: (() => Unit)*): Unit = { run(thunks: _*); () }
}
