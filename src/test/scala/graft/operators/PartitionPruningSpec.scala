package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Partition pruning: a filter on the partition column must reach the
  * scan as a PartitionFilter and shrink the partitions actually read —
  * the layout move that turns a 100 TB date-range query into a scan of
  * the matching dates only. */
class PartitionPruningSpec extends SparkSpec {

  test("partition-column filter prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_parts").toFile.getAbsolutePath
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    try {
      orders.write.partitionBy("o_orderpriority").parquet(s"$dir/orders_p")
      val priorities = orders.select("o_orderpriority").distinct().count()
      assert(priorities > 1)

      val filtered = spark.read.parquet(s"$dir/orders_p")
        .filter(col("o_orderpriority") === "1-URGENT")
      val scan = filtered.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
      assert(scan.partitionFilters.map(_.toString).exists(_.contains("o_orderpriority")),
        scan.partitionFilters.toString)
      // the pruned scan reads exactly the matching directory
      assert(scan.relation.location.inputFiles.length >
        scan.selectedPartitions.totalNumberOfFiles,
        "scan did not prune any partition")

      val expected = orders.filter(col("o_orderpriority") === "1-URGENT").count()
      assert(filtered.count() === expected)
      assert(expected > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("q_partition_prune gate: month filter prunes at planning time") {
    val df = Layout.qPartitionPrune.build(spark, sf)
    // the gate aggregates, so AQE wraps the plan — search its initial plan
    val top = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val scan = top.collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.partitionFilters.map(_.toString).exists(_.contains("o_month")),
      scan.partitionFilters.toString)
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "gate scan did not prune any partition")
    assert(df.count() > 0)
  }
}
