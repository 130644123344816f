package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Faults heap pages once before anything is measured — under a HARD time
  * budget, with progress output.
  *
  * This host's memory subsystem stalls page faults 10-50× in bursts
  * (measured: identical 2 GB allocation bursts 0.3 s vs 87-266 s while
  * the JVM still grows into cold pages; kernel time dominates during
  * stalls; stable ≤0.35 s once the pages have been touched once). The
  * JVM runs ParallelGC with a fixed young gen (build.sbt) so eden reuses
  * the same pages every cycle — but old-gen pages would still be faulted
  * lazily as promotions grow it mid-run. So warm BOTH generations:
  *
  *  - eden: cycle short-lived 100 KB arrays through it a few times;
  *  - old gen: allocate giant arrays (larger than eden, so ParallelGC
  *    places them directly in the old generation), which the single
  *    mutator thread faults while zeroing, then drop them.
  *
  * Round-2 lesson: unbounded, this warmup can stall LONGER than the whole
  * benchmark is worth (BENCH_r02 timed out with zero output — the fix for
  * fault stalls prevented the bench from existing). So the warmup now
  *
  *  - stops at a wall-clock budget (`SPARK_GRAFT_WARMUP_BUDGET_MS`,
  *    default 120 s) — partial warmup beats no benchmark;
  *  - prints a progress line before/during each phase so a hang in the
  *    driver log is attributable;
  *  - sizes arrays from the actual memory pools (old-gen/eden capacity
  *    via MemoryPoolMXBeans) instead of a hardcoded 2 GB, and caps the
  *    retained total below old-gen capacity — a small `SPARK_DRIVER_MEM`
  *    no longer OOMs inside the warmup itself;
  *  - can be skipped entirely with `SPARK_GRAFT_WARMUP=off`.
  *
  * Single-threaded on purpose: parallel pre-fault (-XX:+AlwaysPreTouch)
  * drives kernel soft lockups in GC threads on this host.
  */
object HeapWarmup {

  def cycle(youngMultiplier: Double = 0.4, oldFraction: Double = 0.5): Unit = {
    if (sys.env.get("SPARK_GRAFT_WARMUP").contains("off")) {
      System.err.println("[warmup] skipped (SPARK_GRAFT_WARMUP=off)")
      return
    }
    val budgetMs =
      sys.env.get("SPARK_GRAFT_WARMUP_BUDGET_MS").map(_.toLong).getOrElse(120000L)
    val t0 = System.nanoTime()
    def elapsedMs: Long = (System.nanoTime() - t0) / 1000000L
    def over: Boolean = elapsedMs >= budgetMs
    def log(msg: String): Unit =
      System.err.println(s"[warmup ${elapsedMs / 1000}s] $msg")

    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolMax(name: String): Long =
      pools.find(_.getName.contains(name))
        .map(_.getUsage.getMax).filter(_ > 0).getOrElse(-1L)
    val max = Runtime.getRuntime.maxMemory
    // fall back to build.sbt's fixed -Xmn2g layout if the pools are absent
    val edenMax = { val e = poolMax("Eden"); if (e > 0) e else (1.5e9).toLong }
    val oldMax = { val o = poolMax("Old Gen"); if (o > 0) o else max - (2L << 30) }
    log(s"start: budget=${budgetMs / 1000}s eden=${edenMax >> 20}MB old=${oldMax >> 20}MB")

    var guard = 0L

    // young gen: fault eden pages by cycling short-lived allocations
    val target = (max * youngMultiplier).toLong
    var touched = 0L
    while (touched < target && !over) {
      val keep = new Array[Array[Long]](1000)
      var i = 0
      while (i < 1000) { keep(i) = new Array[Long](12800); i += 1 } // 100 KB each
      guard += keep(999)(12799)
      touched += 1000L * 12800 * 8
    }
    log(s"eden cycled ${touched >> 20}MB")

    // old gen: eden-busting arrays are allocated in old space directly and
    // zero-faulted by this thread; retained until the target is reached so
    // they occupy distinct pages, then released together. Arrays must
    // exceed eden to skip it; retained total stays well under old-gen
    // capacity so the warmup can never OOM.
    val arrayBytes = math.min(2L << 30, oldMax / 3)
    if (arrayBytes <= edenMax) {
      log(s"old-gen skipped: ${arrayBytes >> 20}MB arrays would land in eden")
    } else {
      val arrayLongs = (arrayBytes / 8).toInt
      val retainCap = math.min((oldMax * oldFraction).toLong, oldMax - arrayBytes)
      val n = math.max(1, (retainCap / arrayBytes).toInt)
      val giants = new Array[Array[Long]](n)
      var g = 0
      var oom = false
      while (g < n && !over && !oom) {
        try {
          giants(g) = new Array[Long](arrayLongs)
          giants(g)(arrayLongs - 1) = g
          guard += giants(g)(arrayLongs - 1)
          log(s"old-gen array ${g + 1}/$n (${arrayBytes >> 20}MB) faulted")
        } catch {
          case _: OutOfMemoryError => oom = true; log("old-gen stopped: OOM guard")
        }
        g += 1
      }
      java.util.Arrays.fill(giants.asInstanceOf[Array[AnyRef]], null)
    }

    if (guard == Long.MinValue) System.err.println("[warmup] unreachable")
    System.gc()
    log(if (over) "done (budget reached — partial warmup)" else "done")
  }
}
