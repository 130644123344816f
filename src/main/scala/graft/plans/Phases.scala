package graft.plans

import scala.annotation.tailrec

/** A burst of integer values scheduled at a time offset (ms from plan
  * start, 10 ms resolution). Mirrors the reference's `DataAtTime`
  * (reference: testbed/app/com/typesafe/spark/testbed/DataGenerator.scala:6-14).
  */
final case class TimedValues(timeMs: Long, values: List[Int]) {
  def shift(deltaMs: Long): TimedValues = copy(timeMs = timeMs + deltaMs)
}

/** The 10-ms bucket allocator shared by all rate phases.
  *
  * Bucket `i` (of 100 per second) receives
  * `floor((i+1)*r/100) - floor(i*r/100)` items, evaluated in *double*
  * arithmetic — the reference's golden specs pin the double rounding
  * (e.g. 3 * 0.3 = 0.8999… floors to 0), so an exact integer derivation
  * would diverge. (reference: FixedPhase.scala:11-14, RampPhaseSpec.scala:40-51)
  */
object BucketMath {
  val BucketsPerSecond = 100
  val BucketMs = 10

  def inBucket(i: Int, ratePerSecond: Double): Int = {
    val r10 = ratePerSecond / 100d
    ((i + 1) * r10).toInt - (i * r10).toInt
  }

  /** One second's buckets at `rate`; `mk(alreadyEmitted, n)` chooses the
    * `n` values of a bucket given how many items this second already got.
    */
  def bucketsFor(second: Int, rate: Double)(mk: (Int, Int) => List[Int]): List[TimedValues] = {
    val acc = List.newBuilder[TimedValues]
    var emitted = 0
    var i = 0
    while (i < BucketsPerSecond) {
      val n = inBucket(i, rate)
      if (n > 0) acc += TimedValues(second * 1000L + i * BucketMs, mk(emitted, n))
      emitted += n
      i += 1
    }
    acc.result()
  }

  /** Total rows a second yields at `rate` — Σ inBucket telescopes to
    * floor(100 * (rate/100)) term-by-term in the same double arithmetic,
    * so this is exactly Σ inBucket(i, rate) without the loop. */
  def rowsPerSecond(rate: Double): Int = (100 * (rate / 100d)).toInt
}

/** One rate phase of a test plan. `valuesFor` is a *pure* function of the
  * phase-relative second — this purity is what lets the Spark generator
  * source be deterministic and replayable at any offset.
  */
sealed trait Phase extends Serializable {
  /** Seconds this phase lasts; None = unbounded. */
  def duration: Option[Int]
  /** Scheduled values for phase-relative `second` (0-based). */
  def valuesFor(second: Int): List[TimedValues]
  /** Row count of `valuesFor(second)` without materializing it — admission
    * control calls this once per plan-second per trigger, and building the
    * full value list there (e.g. 50k tuples/s) was pure allocation waste.
    * Exact by the telescoping bucket sum ([[BucketMath.rowsPerSecond]]). */
  def rowCountFor(second: Int): Int
}

/** Emits nothing for `duration` seconds (time offset only).
  * (reference: TestPhase.scala:35-38) */
final case class NoopPhase(duration: Option[Int]) extends Phase {
  def valuesFor(second: Int): List[TimedValues] = Nil
  def rowCountFor(second: Int): Int = 0
}

/** Constant `rate` items/s of a constant `value`. The reference keeps
  * emitting at `second == duration` (strict `<` bound check,
  * FixedPhase.scala:8) — preserved, its LoopPhase golden spec depends on it. */
final case class FixedPhase(value: Int, rate: Int, duration: Option[Int]) extends Phase {
  def valuesFor(second: Int): List[TimedValues] =
    if (duration.exists(_ < second)) Nil
    else BucketMath.bucketsFor(second, rate.toDouble)((_, n) => List.fill(n)(value))
  def rowCountFor(second: Int): Int =
    if (duration.exists(_ < second)) 0 else BucketMath.rowsPerSecond(rate.toDouble)
}

/** Linear rate interpolation from `startRate` to `endRate` over `durationSec`
  * seconds (inclusive endpoints; duration 1 uses startRate only).
  * (reference: RampPhase.scala:9-31) */
final case class RampPhase(value: Int, startRate: Int, endRate: Int, durationSec: Int) extends Phase {
  def duration: Option[Int] = Some(durationSec)
  private def rateAt(second: Int): Double =
    if (durationSec == 1) startRate.toDouble
    else startRate + (endRate - startRate) / (durationSec - 1d) * second
  def valuesFor(second: Int): List[TimedValues] =
    if (second >= durationSec) Nil
    else BucketMath.bucketsFor(second, rateAt(second))((_, n) => List.fill(n)(value))
  def rowCountFor(second: Int): Int =
    if (second >= durationSec) 0 else BucketMath.rowsPerSecond(rateAt(second))
}

/** Constant rate cycling through `values` round-robin across the second's
  * buckets; the element counter advances across buckets within a second and
  * resets each second. (reference: CyclePhase.scala:7-26) */
final case class CyclePhase(values: List[Int], rate: Int, duration: Option[Int]) extends Phase {
  require(values.nonEmpty, "cycle phase needs at least one value")
  def valuesFor(second: Int): List[TimedValues] =
    if (duration.exists(_ <= second)) Nil
    else BucketMath.bucketsFor(second, rate.toDouble)((offset, n) =>
      List.tabulate(n)(x => values((offset + x) % values.size)))
  def rowCountFor(second: Int): Int =
    if (duration.exists(_ <= second)) 0 else BucketMath.rowsPerSecond(rate.toDouble)
}

/** Sequential phase composition: map an absolute second to the active phase
  * and its phase-relative second by walking cumulative durations; an
  * unbounded phase absorbs everything after it.
  * (reference: PhaseContainer.scala:12-50) */
final case class PhaseSeq(phases: List[Phase]) extends Serializable {
  /** None if any member is unbounded. */
  lazy val totalDuration: Option[Int] =
    if (phases.exists(_.duration.isEmpty)) None
    else Some(phases.flatMap(_.duration).sum)

  def activePhase(second: Int): Option[(Phase, Int)] = {
    @tailrec def go(ps: List[Phase], rem: Int): Option[(Phase, Int)] = ps match {
      case p :: rest =>
        p.duration match {
          case Some(d) if d <= rem => go(rest, rem - d)
          case _                   => Some((p, rem))
        }
      case Nil => None
    }
    go(phases, second)
  }

  def valuesFor(second: Int): List[TimedValues] =
    activePhase(second) match {
      case Some((p, local)) =>
        p.valuesFor(local).map(_.shift((second - local) * 1000L))
      case None => Nil
    }

  def rowCountFor(second: Int): Int =
    activePhase(second).map { case (p, local) => p.rowCountFor(local) }.getOrElse(0)
}

/** Repeats its inner phase sequence `times` times (unbounded if None):
  * position-in-loop via modulo, emitted times re-based by the completed
  * loops' offset. (reference: LoopPhase.scala:5-29) */
final case class LoopPhase(times: Option[Int], phases: List[Phase]) extends Phase {
  private val seq = PhaseSeq(phases)
  lazy val duration: Option[Int] =
    for { t <- times; d <- seq.totalDuration } yield t * d

  def valuesFor(second: Int): List[TimedValues] =
    if (duration.exists(_ < second)) Nil
    else {
      val inLoop = seq.totalDuration.map(second % _).getOrElse(second)
      val beforeSec = seq.totalDuration.map(d => (second / d) * d).getOrElse(0)
      seq.valuesFor(inLoop).map(_.shift(beforeSec * 1000L))
    }
  def rowCountFor(second: Int): Int =
    if (duration.exists(_ < second)) 0
    else seq.rowCountFor(seq.totalDuration.map(second % _).getOrElse(second))
}

/** A whole test plan: the phase sequence plus duration algebra (sum of
  * durations; None if any phase is unbounded).
  * (reference: TestPlan.scala:7-12, DataGenerator.scala:16-23) */
final case class TestPlan(phases: List[Phase]) extends Serializable {
  private val seq = PhaseSeq(phases)
  lazy val duration: Option[Int] = seq.totalDuration
  def valuesFor(second: Int): List[TimedValues] = seq.valuesFor(second)
  def isDoneAt(second: Int): Boolean = duration.exists(_ <= second)

  /** Rows generated for `second`, exploded to (timeMs, value) pairs. */
  def rowsFor(second: Int): List[(Long, Int)] =
    valuesFor(second).flatMap(tv => tv.values.map(v => (tv.timeMs, v)))

  /** Count of [[rowsFor]] without materializing it (admission control). */
  def rowCountFor(second: Int): Int = seq.rowCountFor(second)
}
