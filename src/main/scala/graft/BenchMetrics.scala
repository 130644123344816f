package graft

/** Pure metric folds for the bench's streaming legs — factored out of
  * [[Bench]] so the soak-creep and spike-recovery verdicts are unit-
  * testable against synthetic batch series (a metric that gates "is the
  * pipeline degrading" deserves its own spec; the round-8 soak tripped a
  * false positive because mean-of-5 head/tail windows let a single noisy
  * batch swing the ratio).
  */
object BenchMetrics {

  def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

  /** Per-batch cost creep over a soak run's WARM batch durations (caller
    * drops the cold first batch): median(tail window) / median(head
    * window). Median, not mean — one GC-stalled batch in either window
    * must not fake (or mask) a creep verdict. ~1.0 = flat; > 1.5 = the
    * per-batch cost grew with run length, the failure the soak exists to
    * catch. -1 when fewer than 4 warm batches (no verdict). */
  def creepRatio(warmDurs: Seq[Double], window: Int = 5): Double =
    if (warmDurs.size < 4) -1.0
    else {
      val w = math.min(window, warmDurs.size / 2)
      median(warmDurs.takeRight(w)) / math.max(median(warmDurs.take(w)), 1.0)
    }

  /** Absolute tail cost (mean of the last `window` warm batches, ms) —
    * the companion to the RATIO: a ratio of 1.4 over 80 ms batches is
    * noise, over 4000 ms batches it's a problem. */
  def tailMeanMs(warmDurs: Seq[Double], window: Int = 5): Double =
    if (warmDurs.isEmpty) -1.0
    else {
      val t = warmDurs.takeRight(math.min(window, warmDurs.size))
      t.sum / t.size
    }

  /** Spike-recovery shape from a query's per-batch progress:
    * `batches` = (trigger START epoch ms — StreamingQueryProgress
    * .timestamp is stamped when the trigger BEGINS, not when progress
    * is emitted — batch triggerExecution ms), input-carrying WARM
    * batches only (caller drops the cold first batch, as the soak
    * does), in order.
    *
    * Returns (peakDelaySec, drainSec):
    *  - peakDelaySec: the worst batch's execution time — how far past
    *    the trigger interval one batch stretched at the spike's deepest
    *    point. A steering controller caps this near the trigger by
    *    cutting admission; an unsteered run shows the full overload.
    *  - drainSec: the duration of the contiguous over-trigger EPISODE
    *    containing the peak — from its first batch to the end of the
    *    first subsequent batch that fits inside the trigger again. The
    *    episode anchor is the peak, NOT the globally-first over-trigger
    *    batch: one GC-stalled batch in the calm phase must not hijack
    *    the measurement window (the same robustness argument as
    *    [[creepRatio]]'s medians). This is the reference's "N seconds
    *    back to real-time after the spike" number. 0 when no batch ever
    *    overran; -1 when the run ends still behind.
    *
    * Raw wall-clock of the whole plan saturates at the plan length and
    * cannot distinguish controllers; this pair can. CAVEAT: both
    * numbers read batch EXECUTION time — under a very tight admission
    * cap a pipeline can run behind real-time while every batch fits its
    * trigger (backlog hides in admission, not in execution). The bench's
    * spike legs initialize the cap at exactly one trigger of data, so
    * overload shows up in execution time there. */
  def spikeRecovery(batches: Seq[(Long, Double)], triggerMs: Long): (Double, Double) = {
    if (batches.isEmpty) return (-1.0, -1.0)
    val peakIdx = batches.indices.maxBy(batches(_)._2)
    val peakDelaySec = batches(peakIdx)._2 / 1000.0
    val drainSec =
      if (batches(peakIdx)._2 <= triggerMs) 0.0 // never fell behind
      else {
        // walk back from the peak to the start of ITS over-trigger run
        var start = peakIdx
        while (start > 0 && batches(start - 1)._2 > triggerMs) start -= 1
        batches.drop(peakIdx + 1).find(_._2 <= triggerMs) match {
          // timestamps are trigger STARTS, so close the window at the
          // END of the recovered batch: its start + its execution time
          case Some((ts, dur)) => (ts + dur - batches(start)._1) / 1000.0
          case None            => -1.0 // ended still behind
        }
      }
    (peakDelaySec, drainSec)
  }
}
