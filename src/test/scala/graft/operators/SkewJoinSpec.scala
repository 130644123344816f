package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE skew-join: the RUNTIME half of the skew story. `q_salted_agg`
  * demonstrates write-the-salt-yourself mitigation for low-cardinality
  * AGGREGATION skew; for sort-merge JOIN skew the engine-native answer is
  * adaptive execution splitting oversized partitions at runtime
  * (OptimizeSkewedJoin). This spec plants a 90%-hot key and pins that AQE
  * actually splits it — the guarantee that a hot join key at 100 TB
  * degrades to extra parallel tasks, not one straggler executor. */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a planted hot key in a sort-merge join") {
    val confBefore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: the planted partition is ~MBs, not the
      // production 256 MB default — the MECHANISM under test is the same
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      import spark.implicits._
      // fact: 100k rows, 90% on key 0, rest uniform over 1..1000
      val fact = spark.range(100000)
        .select(
          when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 1000 + 1)
            .as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 1001).select(col("id").as("k"), (col("id") * 2).as("w"))

      val joined = fact.join(dim.hint("merge"), "k")
      // collect() (not count()) so the action runs through joined's OWN
      // QueryExecution — count() builds a separate plan and would leave
      // joined.queryExecution.executedPlan un-executed (isFinalPlan=false)
      val n = joined.collect().length
      assert(n === 100000)

      val finalPlan = joined.queryExecution.executedPlan.toString
      // AQE marks both the reader ("AQEShuffleRead ... skewed") and the
      // join node ("SortMergeJoin(skew=true)") when it split a partition
      assert(finalPlan.contains("skew"),
        s"no skew handling in final adaptive plan:\n$finalPlan")
    } finally confBefore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
