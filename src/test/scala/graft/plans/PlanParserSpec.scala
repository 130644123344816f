package graft.plans

import org.scalatest.funsuite.AnyFunSuite

class PlanParserSpec extends AnyFunSuite {

  // the canonical example covering every phase type (reference README.md:33-68)
  private val canonical =
    """
      |sequence = [
      |  { type = noop, duration = 2 }
      |  { type = ramp,  startRate = 1000, endRate = 50000, value = 5, duration = 10 }
      |  { type = fixed, value = 1, rate = 4, duration = 1 }
      |  { type = cycle, values = [5, 5, 5, 7, 5, 5, 5], rate = 4, duration = 1 }
      |  { type = loop,  times = 3, phases = [
      |      { type = fixed, value = 5, rate = 10, duration = 2 }
      |      { type = fixed, value = 6, rate = 5, duration = 3 } ] }
      |]
      |""".stripMargin

  test("parses the canonical plan covering all five phase types") {
    val plan = PlanParser.parse(canonical)
    assert(plan.phases == List(
      NoopPhase(Some(2)),
      RampPhase(5, 1000, 50000, 10),
      FixedPhase(1, 4, Some(1)),
      CyclePhase(List(5, 5, 5, 7, 5, 5, 5), 4, Some(1)),
      LoopPhase(Some(3), List(FixedPhase(5, 10, Some(2)), FixedPhase(6, 5, Some(3))))))
    assert(plan.duration.contains(2 + 10 + 1 + 1 + 3 * 5))
  }

  test("accepts comments, quoted strings, colons, and missing durations") {
    val plan = PlanParser.parse(
      """# a comment
        |sequence: [
        |  { "type": "fixed", value: 7, rate: 50000 }  // unbounded
        |]""".stripMargin)
    assert(plan.phases == List(FixedPhase(7, 50000, None)))
    assert(plan.duration.isEmpty)
  }

  test("rejects plans without a sequence or with unknown phase types") {
    intercept[IllegalArgumentException](PlanParser.parse("foo = 1"))
    intercept[IllegalArgumentException](
      PlanParser.parse("sequence = [ { type = warp, duration = 1 } ]"))
  }

  test("property: parse(render(fixed phase)) round-trips") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val (value, rate, dur) = (rnd.nextInt(200) - 100, rnd.nextInt(60000) + 1, rnd.nextInt(600) + 1)
      val text = s"sequence = [ { type = fixed, value = $value, rate = $rate, duration = $dur } ]"
      assert(PlanParser.parse(text).phases == List(FixedPhase(value, rate, Some(dur))))
    }
  }

  test("property: generated rows per second equal the reference's bucket total") {
    // The reference's double floor-diff arithmetic telescopes to
    // floor(100 * (rate/100d)), which is rate-1 for rates whose /100 rounds
    // down in binary (e.g. 94 → 93.999…). Parity means matching that, not
    // the nominal rate; the difference is always within 1.
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val rate = rnd.nextInt(50000) + 1
      val plan = TestPlan(List(FixedPhase(1, rate, Some(1))))
      val n = plan.rowsFor(0).size
      assert(n == BucketMath.rowsPerSecond(rate.toDouble), s"rate $rate")
      assert(math.abs(n - rate) <= 1, s"rate $rate off by more than 1")
    }
  }
}
