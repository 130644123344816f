package graft

import org.apache.spark.sql.SparkSession

/** Runtime SQL-conf tuning shared by every graft entry point (Bench,
  * Verify, ScaleSmoke, Main, Plans, the test harness) so the mains and
  * the specs execute under the same aggregation regime. */
object SessionTuning {

  /** ObjectHashAggregate's sort-based fallback threshold. The default
    * (128 in-memory groups per partition) would make every graft native
    * aggregate (graft_min_k argmaxes keyed by vec_id, graft_collect_capped
    * LSH buckets) silently degrade to sort-based merging after the first
    * 128 groups — the exact per-partition sort the hash formulations
    * exist to avoid. 2^20 groups × O(k)-element buffers is ≤ ~100 MB per
    * task — far inside executor memory — and at production scale
    * per-partition group cardinality is governed by partition sizing
    * (spark.sql.shuffle.partitions / maxPartitionBytes), which a 100 TB
    * deployment budgets together with this knob. */
  val ObjectHashFallbackGroups: Int = 1 << 20

  def tune(spark: SparkSession): Unit =
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      ObjectHashFallbackGroups.toString)
}
