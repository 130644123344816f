package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's soak-creep and spike-recovery verdicts, pinned on
  * synthetic batch series: the creep metric must stay quiet on flat-but-
  * noisy runs (the round-8 false positive: one GC-stalled batch in a
  * mean window) and must still fire on genuine per-batch cost growth. */
class BenchMetricsSpec extends AnyFunSuite {

  test("median: odd, even, empty") {
    assert(BenchMetrics.median(Seq(3, 1, 2)) === 2.0)
    assert(BenchMetrics.median(Seq(4, 1, 2, 3)) === 2.5)
    assert(BenchMetrics.median(Nil) === 0.0)
  }

  test("flat run with one noisy tail batch stays ~1.0 (the r8 false positive)") {
    // 22 warm batches at ~800 ms, one 3.2 s GC stall near the end — a
    // mean-of-5 tail window reads 1.6×; the median window must not
    val durs = Seq.fill(18)(800.0) ++ Seq(820.0, 3200.0, 790.0, 810.0, 800.0)
    val r = BenchMetrics.creepRatio(durs)
    assert(r > 0.9 && r < 1.1, s"noisy-but-flat run misread as creep: $r")
  }

  test("flat run with one noisy head batch stays ~1.0") {
    val durs = Seq(800.0, 3200.0, 790.0) ++ Seq.fill(20)(800.0)
    val r = BenchMetrics.creepRatio(durs)
    assert(r > 0.9 && r < 1.1, s"noisy head misread: $r")
  }

  test("genuine linear creep is caught") {
    // 80 ms per-batch growth: 800 → 2640 ms over 24 batches
    val durs = (0 until 24).map(i => 800.0 + 80.0 * i)
    val r = BenchMetrics.creepRatio(durs)
    assert(r > 1.5, s"real creep missed: $r")
  }

  test("short runs return no verdict") {
    assert(BenchMetrics.creepRatio(Seq(800.0, 820.0, 790.0)) === -1.0)
  }

  test("tail mean is the absolute companion") {
    val durs = Seq.fill(10)(100.0) ++ Seq.fill(5)(4000.0)
    assert(BenchMetrics.tailMeanMs(durs) === 4000.0)
    assert(BenchMetrics.tailMeanMs(Nil) === -1.0)
  }

  test("spike recovery: peak and drain from a classic overload curve") {
    // 1 s trigger: two calm batches, then the overload episode begins at
    // t0+4000 (first batch > trigger of the run containing the peak),
    // builds to a 4.2 s peak, recovers with the batch STARTING at
    // t0+14200 (timestamps are trigger starts) and running 900 ms —
    // behind real-time until t0+15100, 11.1 s total
    val t0 = 1000000L
    val batches = Seq(
      (t0 + 1000, 900.0), (t0 + 2000, 950.0),
      (t0 + 4000, 2500.0), (t0 + 8200, 4200.0), // peak at t0+8200
      (t0 + 11000, 2800.0), (t0 + 14200, 900.0), // recovered batch starts t0+14200
      (t0 + 15200, 880.0))
    val (peak, drain) = BenchMetrics.spikeRecovery(batches, 1000L)
    assert(peak === 4.2)
    assert(drain === 11.1, s"drain should be 14200+900-4000 = 11.1 s, got $drain")
  }

  test("spike recovery: an isolated pre-spike stall does not hijack the episode window") {
    // one 1.1 s GC-stalled batch in the calm phase, recovered immediately;
    // the real spike episode runs t0+10000 .. end of the recovered batch
    // (starts t0+20000, runs 800 ms). Anchoring at the globally-first
    // over-trigger batch would report ~2 s; the peak-episode anchor
    // reports the spike's own 10.8 s window.
    val t0 = 5000000L
    val batches = Seq(
      (t0 + 1000, 900.0), (t0 + 2000, 1100.0), (t0 + 3000, 900.0),
      (t0 + 10000, 3000.0), (t0 + 14000, 4000.0), (t0 + 18000, 3500.0),
      (t0 + 20000, 800.0))
    val (peak, drain) = BenchMetrics.spikeRecovery(batches, 1000L)
    assert(peak === 4.0)
    assert(drain === 10.8, s"drain should be 20000+800-10000 = 10.8 s, got $drain")
  }

  test("spike recovery: never-behind run has zero drain; never-recovered is -1") {
    val t0 = 5000L
    val calm = Seq((t0, 700.0), (t0 + 1000, 800.0), (t0 + 2000, 750.0))
    val (pk1, dr1) = BenchMetrics.spikeRecovery(calm, 1000L)
    assert(pk1 === 0.8 && dr1 === 0.0)
    val stuck = Seq((t0, 900.0), (t0 + 2000, 3000.0), (t0 + 5000, 2800.0))
    val (pk2, dr2) = BenchMetrics.spikeRecovery(stuck, 1000L)
    assert(pk2 === 3.0 && dr2 === -1.0)
    assert(BenchMetrics.spikeRecovery(Nil, 1000L) === ((-1.0, -1.0)))
  }
}
