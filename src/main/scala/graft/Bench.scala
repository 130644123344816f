package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds
  * at SPARK_GRAFT_SF_DIR.
  *
  * Method notes:
  *  - queries are forced through the `noop` sink, not count() — count()
  *    lets Catalyst prune every computed column and would time a skeleton
  *    of the real plan;
  *  - a warmup pass over small probe queries initializes codegen, shuffle
  *    and broadcast machinery so the first measured query isn't charged
  *    ~10 s of one-time JVM/Spark startup;
  *  - `stream_ingest_50k` is the reference's headline metric (BASELINE.md):
  *    seconds to push a 50,000 rows/s × 20 s plan through parse → Hanoi →
  *    per-batch stats at 5 s triggers; 20 s means real-time parity.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bench0 = System.nanoTime()
    def progress(msg: String): Unit =
      System.err.println(f"[bench ${(System.nanoTime() - bench0) / 1e9}%.0fs] $msg")
    progress(s"starting: sf=$sfDir cpus=$cpus")

    // Fault heap pages BEFORE the SparkSession exists (see HeapWarmup
    // scaladoc): the single-threaded pre-fault can stall minutes on this
    // host, and doing it after startup starves executor heartbeats — a
    // 256 s stall got the local executor deregistered mid-run. The warmup
    // is time-budgeted: BENCH_r02 proved an unbounded warmup can outlast
    // the driver's patience and erase the whole benchmark.
    HeapWarmup.cycle()
    progress("heap warmup done; creating SparkSession")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // local mode: heartbeats are in-process bookkeeping, but a host
      // fault-stall can still starve them past the 120 s default and get
      // the only executor deregistered — give them a wide margin
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    SessionTuning.tune(spark) // shared ObjectHashAggregate fallback sizing
    spark.sparkContext.setLogLevel("WARN")
    // Some testdata generations store events.ts as TIMESTAMP(NANOS); without
    // this a raw scan throws before Tables.events gets a chance to set it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Fail in one clear line if the driver regenerated testdata with a
    // different shape (r5: a silent ts dtype drift cost 28 queries).
    Tables.validate(spark, sfDir)

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warmup: force the FULL registry at the smallest scale factor — the
    // codegen/JIT cost of each distinct plan is paid once here instead of
    // being charged to the first measured run (observed: q1_agg 8.4 s cold
    // vs 1.2 s warm on identical data).
    val warmDir = "/root/testdata/sf0.001"
    progress(s"registry warmup at $warmDir (${SparkEntry.registry.size} queries)")
    SparkEntry.registry.foreach { q =>
      try force(q.build(spark, warmDir))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    progress("streaming warmup")
    locally { // streaming-path warmup (incremental planner + stats codegen)
      val wq = streaming.StreamingStats.run(
        spark, "sequence = [ { type = fixed, value = 7, rate = 500, duration = 2 } ]",
        triggerMs = 100L, sink = (stats, _) => { stats.collect(); () })
      wq.processAllAvailable(); wq.stop()
    }
    progress("warmup complete; measuring")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // Session-health calibration marker (SCALE.md round 11 measured
    // cross-session absolute drift up to ±40% in degraded host windows):
    // a FIXED-size microbench — a pure-CPU xxhash64 fold over 150M
    // generated rows plus one 997-key shuffle — whose cost is independent
    // of sf and of this library's code. Emitted as `calib_s` so future
    // cross-round ratios can be normalized for host/session health
    // without re-running old binaries: compare
    // (metric_r{N}/calib_r{N}) vs (metric_r{M}/calib_r{M}).
    val calibSec = {
      // h is reduced mod a prime BEFORE the sum: raw xxhash64 values are
      // full-range longs whose ANSI sum over 150M rows overflows or not
      // depending on partial-aggregation ORDER (task scheduling) — a
      // flaky crash, observed live. |sum| ≤ 150M × 1000003 « 2^63; the
      // modulo is noise next to the hash, so the marker's cost is
      // unchanged.
      def leg(): Double = time(force(
        spark.range(0L, 150000000L, 1L, 32)
          .selectExpr("xxhash64(id) % 997 AS k", "xxhash64(id + 1) % 1000003 AS h")
          .groupBy("k").agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("h")).as("s"))))
      leg() // warm the plan; the marker is the min of two measured legs
      math.min(leg(), leg())
    }
    progress(f"calibration microbench: $calibSec%.2fs")
    // round-hygiene reminder (judge round 11, 5th consecutive finding):
    // the driver emits BENCH_r{N}.json / CORRECTNESS_r{N}.json AFTER this
    // run — they start untracked. The next session's first action should
    // be `tools/commit_round_artifacts.sh` (safe when nothing changed).
    progress("reminder: run tools/commit_round_artifacts.sh after the driver emits")

    // Two measured passes per query, min reported: at sub-second scale a
    // single run is dominated by GC/JIT/page-fault jitter (r04 vs r03
    // showed 2-3× swings on identical code — q_sessionize 0.54↔1.29 s,
    // q_asof_forward 0.39↔1.24 s), and the min is the cost the plan
    // actually has. ~60 s extra at sf0.1, far inside the driver budget.
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    (1 to 2).foreach { pass =>
      SparkEntry.registry.foreach { q =>
        // timing and success tracked separately — a -1.0 failure marker
        // must not be overwritten by the elapsed time of the failed attempt
        val t0 = System.nanoTime()
        // NonFatal only: an OutOfMemoryError/VM error must abort the
        // bench, not be recorded as one failed row on a corrupted JVM
        val ok =
          try { force(q.build(spark, sfDir)); true }
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            false
          }
        val t = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        results(q.name) = results.get(q.name) match {
          case Some(p) if p >= 0 => if (t >= 0) math.min(p, t) else p
          case _ => t
        }
        progress(f"[pass $pass] ${q.name}: $t%.2fs")
      }
    }
    // Sketch-only percentile timing: the q_approx_percentiles GATE carries
    // the exact percentile next to the sketch (to oracle-check the rank
    // bound), so its row above reports exact-percentile cost. This row is
    // the flag-free ObjectHashAggregate sketch plan — the cost class the
    // approximation exists to buy at 100 TB. Same 2-pass/min discipline.
    // same failure discipline as the registry loop, PER PASS: a throwing
    // pass logs and is skipped, surviving passes still report their min —
    // one transient failure must never erase a valid measurement, and one
    // bad /tmp state must never abort the whole bench
    def timedOr(label: String, runs: Int = 2)(f: => Unit): Double = {
      val ok = (1 to runs).flatMap { _ =>
        try Some(time(f))
        catch { case e if scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $label failed: ${e.getMessage}"); None
        }
      }
      if (ok.isEmpty) -1.0 else ok.min
    }
    // `probe_` prefix, NOT `q_`: this row is bench-only (approximate
    // values — no registry/oracle entry), and the q_* namespace is
    // reserved for registry gates so the bench q-row set and the
    // correctness gate set stay reconcilable by name (RegistryCountSpec
    // pins the invariant against Bench.scala's own source).
    results("probe_approx_percentiles_sketch") = timedOr("probe_approx_percentiles_sketch")(
      force(operators.Analytic.approxPercentilesSketch(spark, sfDir)))
    progress(f"probe_approx_percentiles_sketch: ${results("probe_approx_percentiles_sketch")}%.2fs")

    // Layout-family gates get the calib treatment (warm + min of TWO
    // measured serve legs): their one-time layout build is memoized, so
    // in the registry loop pass 1 times build+serve and pass 2 is the
    // only pure-serve sample — a single sub-second FS-bound sample that
    // round JSONs have shown swinging 2-3× with session FS state (the
    // r13 "phantom regression" adjudication). A third pass here gives the
    // serve a second sample; the row reports the min across all passes.
    operators.Layout.all.foreach { q =>
      val extra = timedOr(s"${q.name} (serve leg 2)", runs = 1)(
        force(q.build(spark, sfDir)))
      // min-merge ONLY over a prior success: a gate that failed both
      // registry passes keeps its -1 sentinel even if this third leg
      // succeeds — a clean-looking number would mask the failure (the
      // discrepancy is still visible in the progress log above)
      if (extra >= 0) results(q.name) = results.get(q.name) match {
        case Some(p) if p >= 0 => math.min(p, extra)
        case Some(p) => p
        case None => extra
      }
      progress(f"[layout serve leg 2] ${q.name}: $extra%.2fs")
    }

    // Build-once/serve-many split for the persisted IVF index: the
    // registry row above measures the SERVE path (the index is memoized
    // after pass 1), but the build cost was folded into pass 1's number.
    // Time them separately: a from-scratch rebuild (codebook train +
    // assign + cell-partitioned write), then two pure serves off the
    // fresh index.
    def onceOr(label: String)(f: => Unit): Double = timedOr(label, runs = 1)(f)
    val ivfBuildSec = onceOr("knn_ivf_persist_build") {
      operators.Similarity.rebuildIvfIndex(spark, sfDir); ()
    }
    val ivfServeSec = timedOr("knn_ivf_persist_serve")(force(
      SparkEntry.registry.find(_.name == "q_knn_ivf_persist").get.build(spark, sfDir)))
    progress(f"knn_ivf_persist build: $ivfBuildSec%.2fs, serve: $ivfServeSec%.2fs")
    val ivf2BuildSec = onceOr("knn_ivf2_persist_build") {
      operators.Similarity.rebuildIvf2Index(spark, sfDir); ()
    }
    val ivf2ServeSec = timedOr("knn_ivf2_persist_serve")(force(
      SparkEntry.registry.find(_.name == "q_knn_ivf2_persist").get.build(spark, sfDir)))
    progress(f"knn_ivf2_persist build: $ivf2BuildSec%.2fs, serve: $ivf2ServeSec%.2fs")
    val lshBuildSec = onceOr("knn_lsh_persist_build") {
      operators.Similarity.rebuildLshIndex(spark, sfDir); ()
    }
    val lshServeSec = timedOr("knn_lsh_persist_serve")(force(
      SparkEntry.registry.find(_.name == "q_knn_lsh_persist").get.build(spark, sfDir)))
    progress(f"knn_lsh_persist build: $lshBuildSec%.2fs, serve: $lshServeSec%.2fs")
    val ivfPqBuildSec = onceOr("knn_ivf_pq_persist_build") {
      operators.Similarity.rebuildIvfPqIndex(spark, sfDir); ()
    }
    val ivfPqServeSec = timedOr("knn_ivf_pq_persist_serve")(force(
      SparkEntry.registry.find(_.name == "q_knn_ivf_pq_persist").get.build(spark, sfDir)))
    // Index-I/O comparison: both serves scan the SAME probed cells, so
    // serve-time scan bytes scale with the postings' on-disk size — the
    // code-only PQ postings vs the float-vector IVF postings is the ~8×
    // shrink the PQ tier exists for, reported as a measured pair rather
    // than a claim.
    def duBytes(path: String): Long =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case scala.util.control.NonFatal(_) => -1L }
    val ivfPostingsBytes =
      duBytes(s"${operators.Similarity.ivfIndexDir(spark, sfDir)}/postings")
    val ivfPqPostingsBytes =
      duBytes(s"${operators.Similarity.ivfPqIndexDir(spark, sfDir)}/postings")
    progress(f"knn_ivf_pq_persist build: $ivfPqBuildSec%.2fs, serve: " +
      f"$ivfPqServeSec%.2fs; postings bytes ivf=$ivfPostingsBytes " +
      f"pq=$ivfPqPostingsBytes")
    // Hybrid retrieval build/serve split: the BUILD leg is the lexical
    // index only (tokenize + impact-capped partial + write) — the
    // semantic half's build is already the knn_ivf_persist_build row
    // above, and double-counting it here would misattribute IVF training
    // cost to the hybrid layer. The SERVE leg is the production RAG
    // shape end-to-end: both branches reading landed artifacts, fusion
    // on their top-k outputs, zero in-flight index construction.
    val bm25BuildSec = onceOr("hybrid_bm25_persist_build") {
      operators.TextAnalysis.rebuildBm25Index(spark, sfDir); ()
    }
    val hybridServeSec = timedOr("hybrid_persist_serve")(force(
      SparkEntry.registry.find(_.name == "q_hybrid_rrf_persist").get.build(spark, sfDir)))
    progress(f"hybrid bm25 build: $bm25BuildSec%.2fs, persisted serve: $hybridServeSec%.2fs")
    progress("batch queries done; streaming headline")

    // Streaming headline: 50k rows/s for 20 s through the full pipeline.
    // Three runs, all reported; the headline key is the MEDIAN — robust
    // against both a single GC-debt-poisoned run (observed 18.6 s vs
    // 43 s run-to-run on identical code) and best-run cherry-picking:
    // the representative run decides the ≤20 s real-time verdict.
    val streamRuns = (1 to 3).map { _ =>
      System.gc()
      time {
        val q = streaming.StreamingStats.run(
          spark,
          "sequence = [ { type = fixed, value = 7, rate = 50000, duration = 20 } ]",
          numStreams = 1,
          triggerMs = 5000L,
          secondsPerTrigger = 5,
          sink = (stats, _) => { stats.collect(); () })
        q.processAllAvailable()
        q.stop()
      }
    }
    results("stream_ingest_50k") = BenchMetrics.median(streamRuns)
    progress("ramp scenario")

    // Ramp scenario (BASELINE.md row "scenario 4": 1,000 → 50-60,000 msg/s
    // ramp; the reference also reports a ~100 s TCP tail-drain after plan
    // end, vs 10-20 s on newer hardware). Here the ramp is time-compressed
    // to 30 s; admission control means there is no receiver-buffer bloat to
    // drain, so wall-clock ≈ plan duration IS the tail-drain parity
    // evidence. Reported outside the per-query total like the spike.
    val rampSec = {
      System.gc()
      time {
        val q = streaming.StreamingStats.run(
          spark,
          "sequence = [ { type = ramp, startRate = 1000, endRate = 50000, value = 7, duration = 30 } ]",
          triggerMs = 5000L,
          secondsPerTrigger = 5,
          sink = (stats, _) => { stats.collect(); () })
        q.processAllAvailable()
        q.stop()
      }
    }
    progress(f"ramp 1k->50k over 30 s of data: $rampSec%.2fs")
    progress("spike recovery scenario")

    // Spike recovery (BASELINE.md rows 7-9: the reference's scenario-2
    // experiment — 30 s drain, 160-200 s back to real-time after a
    // mid-run per-element cost spike; the RS variant recovers
    // immediately). The reference's 2× cost spike (value 8) overwhelmed
    // its 2015 hardware; on this host it is absorbed invisibly (measured
    // peak delay 0.25 s under a 1 s trigger — the metric saturates at
    // zero and cannot exercise the controllers). So the bench's spike is
    // value 15 (2^15 Hanoi moves, 256× the baseline per-row cost,
    // measured ≈2-4× real-time overload): 20k rows/s, 7 → 15 → 7, PID
    // backpressure steering the per-trigger admission cap. Wall-clock
    // for the full plan (bar: ≤ 2× the 30 s data duration) is reported
    // OUTSIDE the per-query total; peak-delay and drain (from
    // BenchMetrics.spikeRecovery) are the controller-distinguishing
    // numbers.
    // ONE spike plan shared by both legs — the estimator leg's entire
    // point is steering the SAME workload, so the plans must not drift
    val spikePlan =
      """sequence = [
        |  { type = fixed, value = 7, rate = 20000, duration = 10 }
        |  { type = fixed, value = 15, rate = 20000, duration = 10 }
        |  { type = fixed, value = 7, rate = 20000, duration = 10 }
        |]""".stripMargin
    // Per-batch progress → (trigger-START epoch ms, triggerExecution ms)
    // for BenchMetrics.spikeRecovery; input-carrying batches only.
    // StreamingQueryProgress.timestamp is the time the trigger BEGAN.
    def progressBatches(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[(Long, Double)] =
      q.recentProgress.toSeq.filter(_.numInputRows > 0).flatMap { p =>
        Option(p.durationMs.get("triggerExecution")).map(d =>
          (java.time.Instant.parse(p.timestamp).toEpochMilli, d.longValue.toDouble))
      }

    // UNSTEERED control leg first: the same spike with NO rate limiting —
    // the baseline the two controllers are measured against. Probed
    // unsteered behavior: per-batch admission takes a full trigger of
    // data regardless of cost, so spike batches stretch to the raw
    // overload (measured 2.2-4.5 s under the 1 s trigger) while the
    // steered legs cap peak delay near the trigger. This three-point
    // comparison (unsteered / controller / estimator) is the modern
    // equivalent of the reference's scenario-2 experiment table.
    val (spikeRawSec, spikeRawPeakDelay, spikeRawDrain) = {
      System.gc()
      var qh: org.apache.spark.sql.streaming.StreamingQuery = null
      val sec = time {
        val q = streaming.StreamingStats.run(
          spark, spikePlan,
          triggerMs = 1000L,
          sink = (stats, _) => { stats.collect(); () })
        qh = q
        q.processAllAvailable()
        q.stop()
      }
      val (pk, dr) = BenchMetrics.spikeRecovery(progressBatches(qh).drop(1), 1000L)
      (sec, pk, dr)
    }
    progress(f"spike recovery (unsteered): $spikeRawSec%.2fs, " +
      f"peak delay $spikeRawPeakDelay%.2fs, drain $spikeRawDrain%.2fs")

    def controllerSpikeRun(): (Double, Double, Double) = {
      System.gc()
      val key = "bench-spike"
      val pid = new streaming.PidController(
        kp = 0.5, ki = 0.1, minRows = 1000, maxRows = 200000)
      val listener = new streaming.PidRateListener(
        key, triggerMs = 1000L, initialLimit = 20000L, pid)
      spark.streams.addListener(listener)
      var qh: org.apache.spark.sql.streaming.StreamingQuery = null
      val sec = try time {
        val q = streaming.StreamingStats.run(
          spark, spikePlan,
          triggerMs = 1000L,
          rateLimitKey = Some(key),
          sink = (stats, _) => { stats.collect(); () })
        // Pin the listener to THIS query immediately: a late async progress
        // event from the just-stopped headline runs would otherwise
        // self-attach it to a dead query id and leave the spike unsteered.
        listener.attach(q)
        qh = q
        q.processAllAvailable()
        q.stop()
      } finally {
        spark.streams.removeListener(listener)
        sources.RateLimitRegistry.clear(key)
      }
      // wall-clock saturates at the plan length and can't distinguish
      // controllers — peak delay + drain time is the pair the reference's
      // spike experiments actually compare (BASELINE.md rows 7-8)
      val (pk, dr) = BenchMetrics.spikeRecovery(progressBatches(qh).drop(1), 1000L) // drop(1): cold-batch exclusion, as the soak does
      (sec, pk, dr)
    }
    // TWO measured runs, per-metric min reported, all runs in the detail
    // (`stream_spike_runs`): single-run spike legs fabricated a 1.7×
    // estimator "regression" in r13 that was indistinguishable from
    // session noise — the same repeat-and-min discipline the sub-second
    // registry rows and calib_s already use. ~30 s extra per leg.
    val spikeRuns = Seq.fill(2)(controllerSpikeRun())
    val (spikeSec, spikePeakDelay, spikeDrain) =
      (spikeRuns.map(_._1).min, spikeRuns.map(_._2).min, spikeRuns.map(_._3).min)
    progress(f"spike recovery: $spikeSec%.2fs for 30 s of spiked data, " +
      f"peak delay $spikePeakDelay%.2fs, drain $spikeDrain%.2fs " +
      s"(runs: ${spikeRuns.map(r => f"${r._2}%.2f").mkString("/")} peak)")
    progress("spike recovery, estimator mode (PIDRateEstimator parity)")

    // The same spike leg driven by the ESTIMATOR (PidRateEstimator) — the
    // reference-parity implementation of Spark Streaming's
    // PIDRateEstimator with the documented gains (reference
    // test-runs-004: PID(-1, -0.2, 0) — here proportional=1.0,
    // integral=0.2, derivative=0 under Spark's subtractive convention).
    // The controller leg above steers a batch-overrun factor loop; this
    // leg steers an absolute rows/s target from processing rate +
    // scheduling-delay backlog, the semantics the reference's experiments
    // actually compare. Same plan, same bar: ≤ 2× the 30 s data duration.
    def estimatorSpikeRun(): (Double, Double, Double) = {
      System.gc()
      val key = "bench-spike-est"
      val listener = new streaming.PidRateListener(
        key, triggerMs = 1000L, initialLimit = 20000L,
        estimator = Some(new streaming.PidRateEstimator(
          batchIntervalMs = 1000L, proportional = 1.0,
          integral = 0.2, derivative = 0.0)))
      spark.streams.addListener(listener)
      var qh: org.apache.spark.sql.streaming.StreamingQuery = null
      val sec = try time {
        val q = streaming.StreamingStats.run(
          spark, spikePlan,
          triggerMs = 1000L,
          rateLimitKey = Some(key),
          sink = (stats, _) => { stats.collect(); () })
        listener.attach(q)
        qh = q
        q.processAllAvailable()
        q.stop()
      } finally {
        spark.streams.removeListener(listener)
        sources.RateLimitRegistry.clear(key)
      }
      val (pk, dr) = BenchMetrics.spikeRecovery(progressBatches(qh).drop(1), 1000L) // drop(1): cold-batch exclusion, as the soak does
      (sec, pk, dr)
    }
    val spikeEstRuns = Seq.fill(2)(estimatorSpikeRun()) // same discipline as the controller leg
    val (spikeEstSec, spikeEstPeakDelay, spikeEstDrain) = (spikeEstRuns.map(_._1).min,
      spikeEstRuns.map(_._2).min, spikeEstRuns.map(_._3).min)
    progress(f"spike recovery (estimator): $spikeEstSec%.2fs for 30 s of spiked data, " +
      f"peak delay $spikeEstPeakDelay%.2fs, drain $spikeEstDrain%.2fs " +
      s"(runs: ${spikeEstRuns.map(r => f"${r._2}%.2f").mkString("/")} peak)")
    progress("stream soak: 120 s sustained 50k rows/s, stateful window agg")

    // Soak (the reference's "memory is stable" endurance analysis,
    // test-runs-001): 120 s of sustained 50k rows/s through the STATEFUL
    // event-time pipeline (watermarked tumbling windows), six times the
    // headline's 20 s window. Two things must hold for the 100 TB claim:
    // batch durations stay FLAT (no per-batch cost creep from accumulating
    // state/lineage) and the state store stays BOUNDED (watermark evicts
    // closed windows, so state rows plateau at rate x horizon, never grow
    // with run length). Both are read from StreamingQueryProgress and
    // reported; wall-clock ≈ plan duration is the real-time-parity bar.
    //
    // TWO measured runs per bench — the spike-leg repeat discipline
    // (r14 "what's wrong #1": the single-run tail/head ratio swung
    // 0.46 → 0.92 → 3.05 across otherwise-healthy sessions with FLAT
    // state, leaving a real stateful-path degradation indistinguishable
    // from a degraded host window). Headline keys report the per-metric
    // MIN; BOTH runs land in BENCH_DETAIL (`stream_soak_runs`) with
    // their full per-batch ms vectors, so a climb that reproduces in
    // both same-session runs is a finding, one that doesn't is noise —
    // adjudicable from the artifact alone.
    // gcMs: JVM-wide GC time during the run — the attribution column for
    // a tail climb (per-batch ms rising WITH gc_ms ⇒ bench-JVM heap debt
    // / host window; rising WITHOUT ⇒ a real stateful-path cost creep,
    // diagnosable from the same artifact)
    case class SoakRun(sec: Double, batches: Int, ratio: Double,
        tailMs: Double, durs: Seq[Double], stateMax: Long, stateLast: Long,
        gcMs: Long, memStartMb: Long, memEndMb: Long)
    def totalGcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    // host MemAvailable (MB) — the external-pressure attribution column:
    // the r14/r15 soak-tail swings reproduced exactly when a co-resident
    // process ate the host's memory during the soak window (SCALE.md
    // §Round 15); recording start/end per run makes a degraded window
    // detectable from BENCH_rN.json alone, no session prose needed
    def memAvailMb(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/meminfo")
        try src.getLines().collectFirst {
          case l if l.startsWith("MemAvailable:") =>
            l.trim.split("\\s+")(1).toLong / 1024
        }.getOrElse(-1L)
        finally src.close()
      } catch { case scala.util.control.NonFatal(_) => -1L }
    def soakRun(): SoakRun = {
      System.gc()
      val memStart = memAvailMb()
      val gc0 = totalGcMs()
      val src = spark.readStream.format("plan-gen")
        .option("plan",
          "sequence = [ { type = fixed, value = 7, rate = 50000, duration = 120 } ]")
        .option("streamId", 0)
        .option("secondsPerTrigger", 5)
        .option("numPartitions", spark.sparkContext.defaultParallelism)
        .load()
      val q = streaming.StreamingStats.windowedStats(
        streaming.StreamingStats.withHanoiCost(src))
        .writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(5000L))
        .format("noop")
        .start()
      val sec = time { q.processAllAvailable(); q.stop() }
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      val durs = prog.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.longValue.toDouble))
      val stateRows = prog.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      // tail-vs-head batch-duration creep, first batch (cold) excluded —
      // MEDIAN windows (BenchMetrics.creepRatio): one GC-stalled batch in
      // either window must not fake or mask a creep verdict (the round-8
      // soak tripped exactly that false positive on mean windows).
      val warm = durs.drop(1).toSeq
      SoakRun(sec, durs.size,
        BenchMetrics.creepRatio(warm),
        BenchMetrics.tailMeanMs(warm),
        durs.toSeq,
        if (stateRows.isEmpty) -1L else stateRows.max,
        if (stateRows.isEmpty) -1L else stateRows.last,
        totalGcMs() - gc0, memStart, memAvailMb())
    }
    val soakRuns = (1 to 2).map { i =>
      val r = soakRun()
      progress(f"soak run $i: ${r.sec}%.2fs for 120 s of data, " +
        f"${r.batches} batches, tail/head median ratio ${r.ratio}%.2f, " +
        f"tail mean ${r.tailMs}%.0f ms, state rows max=${r.stateMax} " +
        f"last=${r.stateLast}, gc ${r.gcMs} ms")
      r
    }
    // per-metric min (the plan's actual cost shape); state maxima are
    // boundedness evidence, so take the WORST run there
    val soakSec = soakRuns.map(_.sec).min
    val soakBatches = soakRuns.map(_.batches).max
    val soakFlat = soakRuns.map(_.ratio).min
    // companion WORST-run ratio: a creep that reproduces in only one of
    // the two same-session runs must be visible in the headline artifact
    // (the min alone hides it until someone opens BENCH_DETAIL's runs)
    val soakFlatMax = soakRuns.map(_.ratio).max
    val soakTailMs = soakRuns.map(_.tailMs).min
    val soakStateRowsMax = soakRuns.map(_.stateMax).max
    val soakStateRowsLast = soakRuns.map(_.stateLast).max
    // the legacy single-vector key keeps the per-batch series of the run
    // the headline ratio came from; both vectors are in stream_soak_runs
    val soakDurs = soakRuns.minBy(_.ratio).durs
    progress("dedup-state soak: 60 s, 50k unique keys/s through dropDuplicatesWithinWatermark")

    // Dedup-state soak — the window soak's state plateaus at a handful of
    // rows (one per open window), which proves eviction but not pressure.
    // This leg is the WORST case for dedup state: every row a distinct key
    // (uuid), so the state store must absorb rate × watermark-horizon keys
    // (~50k × 15 s ≈ 750k rows) and PLATEAU there while total input grows
    // unboundedly — the difference between "state = what's in the horizon"
    // and "state = everything ever seen". max ≈ last and max ≪ total
    // input is the boundedness evidence.
    val (dsoakSec, dsoakRows, dsoakStateMax, dsoakStateLast) = {
      System.gc()
      val src = spark.readStream.format("plan-gen")
        .option("plan",
          "sequence = [ { type = fixed, value = 1, rate = 50000, duration = 60 } ]")
        .option("streamId", 0)
        .option("secondsPerTrigger", 5)
        .option("numPartitions", spark.sparkContext.defaultParallelism)
        .load()
      val q = src.withColumn("k", org.apache.spark.sql.functions.expr("uuid()"))
        .withWatermark("event_time", "10 seconds")
        .dropDuplicatesWithinWatermark("k")
        .writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(5000L))
        .format("noop")
        .start()
      val sec = time { q.processAllAvailable(); q.stop() }
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      val rows = prog.map(_.numInputRows).sum
      val state = prog.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      (sec, rows,
        if (state.isEmpty) -1L else state.max,
        if (state.isEmpty) -1L else state.last)
    }
    progress(f"dedup soak: $dsoakSec%.2fs, $dsoakRows rows in, " +
      f"state rows max=$dsoakStateMax last=$dsoakStateLast " +
      f"(bounded: max ≪ $dsoakRows)")
    progress("max sustained rate probe")

    // Max-sustained-rate probe: the headline proves 50k rows/s fits
    // real-time, but not WHERE the ceiling is. Double the fixed-phase
    // rate until a 20 s plan no longer finishes inside the sustain bar
    // (plan duration + one trigger of slack), then one bisection step
    // between the last sustained and first unsustained rate. The quoted
    // ceiling is the engine's headline number against the reference's
    // 25k rows/s sustained (BASELINE.md, 2015 hardware).
    // (wall sec, rows actually ingested) — a probe only counts as
    // sustained if the FULL rate×20 rows passed through inside the bar;
    // a generator or admission shortfall must not fake a sustained rate
    def ingestWall(rate: Int): (Double, Long) = {
      System.gc()
      var qh: org.apache.spark.sql.streaming.StreamingQuery = null
      val sec = time {
        val q = streaming.StreamingStats.run(
          spark,
          s"sequence = [ { type = fixed, value = 7, rate = $rate, duration = 20 } ]",
          numStreams = 1,
          triggerMs = 5000L,
          secondsPerTrigger = 5,
          sink = (stats, _) => { stats.collect(); () })
        qh = q
        q.processAllAvailable()
        q.stop()
      }
      (sec, qh.recentProgress.map(_.numInputRows).sum)
    }
    val sustainBar = 25.0 // 20 s of data + one 5 s trigger of slack
    val probeCap = 6400000 // 128× the headline; bounds probe wall-time
    val rateProbes = scala.collection.mutable.LinkedHashMap[Int, Double](
      50000 -> BenchMetrics.median(streamRuns)) // headline runs ARE the 50k probe
    val (maxRate, probeCeil) = {
      def sustained(r: Int): Boolean = {
        val (w, rows) = ingestWall(r)
        rateProbes(r) = w
        val full = rows == 20L * r
        progress(f"rate probe $r%d rows/s: $w%.2fs, $rows%d rows " +
          f"(bar $sustainBar%.0fs${if (full) "" else ", SHORTFALL"})")
        full && w <= sustainBar
      }
      // the seeded headline median is only a valid 50k probe if it met
      // the bar; otherwise re-probe 50k for real (GC-poisoned medians
      // must not let the doubling start from an unproven floor)
      var lo =
        if (rateProbes(50000) <= sustainBar || sustained(50000)) 50000 else 0
      var hi = if (lo == 0) 50000 else -1
      var r = 100000
      while (hi < 0 && r <= probeCap) {
        if (sustained(r)) { lo = r; r *= 2 } else hi = r
      }
      if (hi > 0 && hi - lo > lo / 2) { // one bisection step
        val mid = (lo + hi) / 2 / 1000 * 1000
        if (sustained(mid)) lo = mid
      }
      (lo, hi)
    }
    progress(f"max sustained rate: $maxRate%d rows/s (first unsustained: " +
      (if (probeCeil > 0) f"$probeCeil%d)" else f"none up to the $probeCap%d probe cap)"))
    progress("streaming ANN end-to-end: ingest -> shard-route -> ivf2 leaf assign")

    // The full streaming ANN production path as ONE leg: a live plan-gen
    // stream at the headline 50k rows/s, each 5 s micro-batch landed
    // shard-partitioned on disk (StreamShardRouter layout), read back,
    // and assigned into the PERSISTED two-level IVF index's leaf cells
    // (frozen serve-path codebook). Wall-clock ≈ plan duration means the
    // complete ingest→route→assign chain holds real-time under the
    // trigger — the end-to-end claim the per-piece legs can't make.
    val (annSec, annBatches, annRows) = {
      System.gc()
      val cents = operators.Similarity.ivf2LeafCentroids(spark, sfDir).localCheckpoint()
      // same /tmp hygiene as the other graft roots: dead-pid dirs from
      // crashed benches are reaped here (age-floored), ours deleted below
      val annPid = ProcessHandle.current().pid()
      operators.TmpDirs.reap("/tmp/graft_annleg", annPid,
        operators.TmpDirs.runPrefixPid)
      val outDir = s"/tmp/graft_annleg/run_${annPid}_${System.nanoTime()}"
      val rowsAssigned = new java.util.concurrent.atomic.AtomicLong(0)
      val nBatches = new java.util.concurrent.atomic.AtomicLong(0)
      import org.apache.spark.sql.functions._
      val src = spark.readStream.format("plan-gen")
        .option("plan",
          "sequence = [ { type = fixed, value = 7, rate = 50000, duration = 20 } ]")
        .option("streamId", 0)
        .option("secondsPerTrigger", 5)
        .option("numPartitions", spark.sparkContext.defaultParallelism)
        .load()
      try {
        val sec = time {
        val q = src.writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(5000L))
          .foreachBatch { (raw: org.apache.spark.sql.DataFrame, id: Long) =>
            // enrichment happens per batch: monotonically_increasing_id is
            // batch-scope-only (unsupported on streaming frames), and a
            // real ingest derives ids at landing time anyway. It restarts
            // at 0 every batch, so fold the batch id ABOVE the id's full
            // layout — partition id occupies bits 33..63-of-use, so the
            // stride must clear the partition FIELD, not bit 33: 2^50
            // leaves room for 2^17 partitions × 2^33 rows per batch,
            // making landed ids globally unique across batch=N dirs
            val b = raw
              .withColumn("vec_id",
                monotonically_increasing_id() + lit(id * (1L << 50)))
              .withColumn("doc_id", col("vec_id"))
              .withColumn("label", pmod(col("value"), lit(8)).cast("int"))
              .withColumn("embedding",
                streaming.StreamAnnIngest.synthEmbedding(col("value"), col("vec_id")))
              .select("doc_id", "vec_id", "label", "embedding")
            val n = streaming.StreamAnnIngest.ingestStep(b, cents, outDir, id).count()
            rowsAssigned.addAndGet(n)
            nBatches.incrementAndGet()
            ()
          }
          .start()
        q.processAllAvailable()
        q.stop()
      }
        (sec, nBatches.get, rowsAssigned.get)
      } catch {
        // leg isolation, like every other leg's timedOr: a failing ANN
        // leg (r10: an ANSI overflow here killed the whole bench JSON)
        // must report -1, not erase the other 158 measurements
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] stream_ann_e2e failed: ${e.getMessage}")
          (-1.0, -1L, -1L)
      } finally {
        // finally: a failed leg must not strand a 1M-row routed corpus
        // copy in /tmp (the reap above only covers DEAD pids, aged)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
      }
    }
    progress(f"streaming ANN e2e: $annSec%.2fs for 20 s of data, " +
      f"$annBatches batches, $annRows rows routed+assigned")

    // total = sum of per-query timings (streaming counted once, via the
    // headline key; the individual runs are informational extras)
    val total = results.values.filter(_ >= 0).sum
    val runsJson = streamRuns.map(v => f"$v%.3f").mkString("[", ",", "]")

    // Full per-query detail goes to a FILE: the driver keeps only the last
    // 2000 chars of stdout, and the full map (84 keys, ~2100 chars) no
    // longer fits next to sbt's epilogue — BENCH_r04.json came back
    // "parsed": null because the tail cut the line mid-JSON.
    val qsAll = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // `*_context`: every spike/soak row in this JSON is measured INSIDE
    // the bench JVM, after the registry loop aged the heap — machine-
    // readable so a cross-round diff never compares an in-bench row
    // against a fresh-JVM probe (SCALE.md measured that context gap at
    // ~2× on the spike peak; the r14 judge asked for the field)
    val soakJson =
      f""""stream_soak_context":"in-bench","stream_soak_s":$soakSec%.3f,"stream_soak_batches":$soakBatches,"stream_soak_tail_head_ratio":$soakFlat%.3f,"stream_soak_tail_head_ratio_max":$soakFlatMax%.3f,"stream_soak_tail_mean_ms":$soakTailMs%.1f,"stream_soak_state_rows_max":$soakStateRowsMax,"stream_soak_state_rows_last":$soakStateRowsLast,"dedup_soak_s":$dsoakSec%.3f,"dedup_soak_rows_in":$dsoakRows,"dedup_soak_state_rows_max":$dsoakStateMax,"dedup_soak_state_rows_last":$dsoakStateLast"""
    val soakRunsJson = soakRuns.map { r =>
      f"""{"sec":${r.sec}%.3f,"batches":${r.batches},"tail_head_ratio":${r.ratio}%.3f,"tail_mean_ms":${r.tailMs}%.1f,"state_rows_max":${r.stateMax},"state_rows_last":${r.stateLast},"gc_ms":${r.gcMs},"mem_avail_start_mb":${r.memStartMb},"mem_avail_end_mb":${r.memEndMb},"batch_ms":${r.durs.map(d => f"$d%.0f").mkString("[", ",", "]")}}"""
    }.mkString("[", ",", "]")
    // stdout variant omits the unsteered control point (detail-only) to
    // keep the line inside the driver's 2000-char stdout tail
    val spikeJsonLine =
      f""""stream_spike_context":"in-bench","stream_spike_recovery_s":$spikeSec%.3f,"stream_spike_peak_delay_s":$spikePeakDelay%.3f,"stream_spike_drain_s":$spikeDrain%.3f,"stream_spike_recovery_estimator_s":$spikeEstSec%.3f,"stream_spike_est_peak_delay_s":$spikeEstPeakDelay%.3f,"stream_spike_est_drain_s":$spikeEstDrain%.3f"""
    def runsArr(rs: Seq[(Double, Double, Double)]): String = rs
      .map(r => f"""{"sec":${r._1}%.3f,"peak_delay_s":${r._2}%.3f,"drain_s":${r._3}%.3f}""")
      .mkString("[", ",", "]")
    val spikeJson = spikeJsonLine +
      f""","stream_spike_unsteered_s":$spikeRawSec%.3f,"stream_spike_unsteered_peak_delay_s":$spikeRawPeakDelay%.3f,"stream_spike_unsteered_drain_s":$spikeRawDrain%.3f,"stream_spike_runs":${runsArr(spikeRuns)},"stream_spike_est_runs":${runsArr(spikeEstRuns)}"""
    val probesJson = rateProbes
      .map { case (r, w) => f""""$r%d":$w%.3f""" }.mkString("{", ",", "}")
    // stdout variant stays slim: the driver keeps only the LAST 2000
    // chars of stdout and the r08 line already measured 1637 — probe
    // detail and ANN counters live in BENCH_DETAIL.json only
    val rateJsonLine =
      f""""stream_max_rate_rows_s":$maxRate,"stream_ann_e2e_s":$annSec%.3f"""
    val rateJson =
      rateJsonLine +
        f""","stream_rate_probes":$probesJson,"stream_ann_e2e_batches":$annBatches,"stream_ann_e2e_rows":$annRows"""
    val soakDursJson = soakDurs.map(d => f"$d%.0f").mkString("[", ",", "]")
    val detail =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","calib_s":$calibSec%.3f,"queries":$qsAll,"stream_runs":$runsJson,"stream_ramp_50k_s":$rampSec%.3f,$spikeJson,$rateJson,"knn_ivf_persist_build_s":$ivfBuildSec%.3f,"knn_ivf_persist_serve_s":$ivfServeSec%.3f,"knn_ivf2_persist_build_s":$ivf2BuildSec%.3f,"knn_ivf2_persist_serve_s":$ivf2ServeSec%.3f,"knn_lsh_persist_build_s":$lshBuildSec%.3f,"knn_lsh_persist_serve_s":$lshServeSec%.3f,"knn_ivf_pq_persist_build_s":$ivfPqBuildSec%.3f,"knn_ivf_pq_persist_serve_s":$ivfPqServeSec%.3f,"ivf_postings_bytes":$ivfPostingsBytes,"ivf_pq_postings_bytes":$ivfPqPostingsBytes,"hybrid_bm25_persist_build_s":$bm25BuildSec%.3f,"hybrid_persist_serve_s":$hybridServeSec%.3f,$soakJson,"stream_soak_batch_ms":$soakDursJson,"stream_soak_runs":$soakRunsJson,"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (detail + "\n").getBytes("UTF-8"))

    // The stdout line carries one representative per headline family
    // (dedup/LSH, embeddings, heavy relational, streaming) plus ANY
    // failed query — failures must never be hidden by the compaction.
    // HARD BUDGET: the driver keeps only the LAST 2000 chars of stdout,
    // and a line past that is cut MID-JSON from the front —
    // BENCH_r14.json came back `"parsed": null` exactly this way (its
    // line had crept to ~2210 chars; only the tail fragment survived as
    // evidence). So the persisted build/serve split and index-bytes keys
    // now live in BENCH_DETAIL.json ONLY, the headline set is one-per-
    // family, and a length guard drops the query map to failures-only
    // rather than ever emitting an unparseable line.
    val headline = Set(
      "q1_agg", "q_join_fact", "q_bloom_join", "q_sessionize",
      "q_rolling_window", "q_percentiles", "q_tfidf_top",
      "q_minhash_pairs", "q_ngram_jaccard", "q_simhash_pairs",
      "q_dedup_near", "q_dedup_clusters", "q_corpus_pipeline",
      "q_lm_score", "q_knn_brute", "q_knn_ivf", "q_knn_pq_adc",
      "q_embed_neardup", "q_embed_clusters", "q_semdedup",
      "q_incr_dedup", "q_knn_rerank", "q_merge_upsert",
      "q_approx_percentiles", "probe_approx_percentiles_sketch",
      "q_knn_ivf_persist", "q_knn_ivf2_persist",
      "q_stream_batch_stats", "stream_ingest_50k")
    val failed = results.valuesIterator.count(_ < 0)
    def stdoutLine(qs: String): String =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","calib_s":$calibSec%.3f,"queries":$qs,"n_queries":${results.size},"failed":$failed,"stream_runs":$runsJson,"stream_ramp_50k_s":$rampSec%.3f,$spikeJsonLine,$rateJsonLine,$soakJson,"detail":"BENCH_DETAIL.json","sf":"$sfDir"}"""
    def qsJson(p: ((String, Double)) => Boolean): String = results
      .filter(p)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val line = stdoutLine(qsJson { case (k, v) => headline.contains(k) || v < 0 })
    // three tiers, each still a complete JSON object: headline map →
    // failures-only map → EMPTY map. The failures-only fallback is
    // itself unguarded against ~80 failed queries (~25 chars each), and
    // a cut-mid-JSON line is strictly worse than a query-less one —
    // n_queries/failed counts and the BENCH_DETAIL pointer survive every
    // tier, so the round's evidence is always parseable.
    val failLine = stdoutLine(qsJson { case (_, v) => v < 0 })
    println(
      if (line.length <= 1950) line
      else if (failLine.length <= 1950) failLine
      else stdoutLine("{}"))
    spark.stop()
  }
}
