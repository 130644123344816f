package graft

/** Faults the whole heap once before anything is measured.
  *
  * This host's memory subsystem stalls page faults 10-50× in bursts
  * (measured: identical 2 GB allocation bursts 0.3 s vs 87-266 s while
  * the JVM still grows into cold pages; kernel time dominates during
  * stalls; stable ≤0.35 s once the pages have been touched once). The
  * JVM runs ParallelGC with a fixed young gen (build.sbt) so eden reuses
  * the same pages every cycle — but old-gen pages would still be faulted
  * lazily as promotions grow it mid-run (observed: queries 3 s warm in
  * isolation vs 13 s mid-bench). So warm BOTH generations:
  *
  *  - eden: cycle short-lived 100 KB arrays through it a few times;
  *  - old gen: allocate giant arrays (2 GB each — larger than eden, so
  *    ParallelGC places them directly in the old generation), which the
  *    single mutator thread faults while zeroing, then drop them.
  *
  * Single-threaded on purpose: parallel pre-fault (-XX:+AlwaysPreTouch)
  * drives kernel soft lockups in GC threads.
  */
object HeapWarmup {
  def cycle(youngMultiplier: Double = 0.4, oldFraction: Double = 0.7): Unit = {
    val max = Runtime.getRuntime.maxMemory
    var guard = 0L

    // young gen: fault eden pages by cycling short-lived allocations
    val target = (max * youngMultiplier).toLong
    var touched = 0L
    while (touched < target) {
      val keep = new Array[Array[Long]](1000)
      var i = 0
      while (i < 1000) { keep(i) = new Array[Long](12800); i += 1 } // 100 KB each
      guard += keep(999)(12799)
      touched += 1000L * 12800 * 8
    }

    // old gen: eden-busting arrays are allocated in old space directly and
    // zero-faulted by this thread; retained until the target is reached so
    // they occupy distinct pages, then released together
    val giantLongs = 256 * 1024 * 1024 // 2 GB
    val n = math.max(1, ((max * oldFraction) / (8L * giantLongs)).toInt)
    val giants = new Array[Array[Long]](n)
    var g = 0
    while (g < n) { giants(g) = new Array[Long](giantLongs); giants(g)(giantLongs - 1) = g; g += 1 }
    guard += giants(n - 1)(giantLongs - 1)
    java.util.Arrays.fill(giants.asInstanceOf[Array[AnyRef]], null)

    if (guard == Long.MinValue) System.err.println("[warmup] unreachable")
    System.gc()
  }
}
