package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.plans.PlanParser
import graft.sources.PlanGenerator
import graft.streaming.StreamingStats

/** Registry entries exercising the plan-driven generator and the per-batch
  * stats pipeline in batch form. Rows-only checks (the generated data is
  * not a DuckDB table); exactness is pinned by the golden generator specs
  * and PlanSourceSpec.
  */
object GeneratorQueries {

  /** Scaled-down scenario-1 (reference test-runs-004): noop, ramp-up,
    * sustained fixed phase. */
  val Scenario1Scaled: String =
    """sequence = [
      |  { type = noop, duration = 2 }
      |  { type = ramp, startRate = 100, endRate = 5000, value = 7, duration = 30 }
      |  { type = fixed, value = 7, rate = 5000, duration = 60 }
      |]""".stripMargin

  private val Mixed: String =
    """sequence = [
      |  { type = fixed, value = 4, rate = 1000, duration = 10 }
      |  { type = cycle, values = [5, 5, 5, 7, 5, 5, 5], rate = 1000, duration = 10 }
      |  { type = loop, times = 3, phases = [
      |      { type = fixed, value = 5, rate = 100, duration = 2 }
      |      { type = fixed, value = 6, rate = 50, duration = 3 } ] }
      |]""".stripMargin

  /** Generator fidelity: per-value totals and event-time span. */
  val qGenCounts: Q = Q.noOracle("q_gen_plan_counts") { (s, _) =>
    PlanGenerator.generate(s, PlanParser.parse(Scenario1Scaled))
      .groupBy("value")
      .agg(
        count(lit(1)).as("rows"),
        min("event_time").as("first_event"),
        max("event_time").as("last_event"))
  }

  /** Per-second generated rate (the reference's tick.log view). */
  val qGenRate: Q = Q.noOracle("q_gen_rate_per_second") { (s, _) =>
    PlanGenerator.generate(s, PlanParser.parse(Scenario1Scaled))
      .groupBy(window(col("event_time"), "1 second"))
      .agg(count(lit(1)).as("rows"))
      .select(col("window.start").as("second"), col("rows"))
  }

  /** The streaming query's aggregation in batch form over a mixed plan,
    * with the deterministic identity metric so values are checkable. */
  val qStreamStats: Q = Q.noOracle("q_stream_batch_stats") { (s, _) =>
    val gen = PlanGenerator.generate(s, PlanParser.parse(Mixed))
      .withColumn("hanoi_ms", col("value").cast("long"))
    StreamingStats.batchStats(gen)
  }

  val all: Seq[Q] = Seq(qGenCounts, qGenRate, qStreamStats)
}
