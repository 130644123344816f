package graft

/** Cycles short-lived allocations through the young generation a few
  * times before anything is measured.
  *
  * This host's memory subsystem stalls page faults 10-50× in bursts
  * (measured: identical 2 GB allocation bursts 0.3 s vs 87-266 s while
  * the JVM still grows into cold pages; kernel time dominates during
  * stalls; stable ≤0.35 s once the pages have been touched once). The
  * JVM runs ParallelGC with a fixed young gen (build.sbt) so eden reuses
  * the same pages every cycle — cycling ~2× the young gen here faults
  * them all once, moving the stall cost into unmeasured warmup.
  * Single-threaded on purpose: parallel pre-fault (-XX:+AlwaysPreTouch)
  * drives kernel soft lockups in GC threads.
  */
object HeapWarmup {
  def cycle(multiplier: Double = 0.4): Unit = {
    val target = (Runtime.getRuntime.maxMemory * multiplier).toLong
    var touched = 0L
    var guard = 0L
    while (touched < target) {
      val keep = new Array[Array[Long]](1000)
      var i = 0
      while (i < 1000) { keep(i) = new Array[Long](12800); i += 1 } // 100 KB each
      guard += keep(999)(12799)
      touched += 1000L * 12800 * 8
    }
    if (guard != 0) System.err.println("[warmup] unreachable")
    System.gc()
  }
}
