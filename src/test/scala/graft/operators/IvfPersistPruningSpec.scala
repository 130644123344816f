package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

/** The persisted IVF index's entire value claim is that Spark's partition
  * pruning IS the inverted-file seek: postings land cell-partitioned
  * (`cell=<id>/`), probes broadcast, and the scan reads ONLY the probed
  * cells' directories. The docstring (Similarity.scala qKnnIvfPersist)
  * promises the scan's PartitionFilters carry the probed-cell predicate —
  * this spec pins it, the way PartitionPruningSpec pins
  * q_partition_prune: the filter must be present at the scan AND the
  * executed scan must read fewer files than the index holds.
  *
  * The probe predicate comes from another query (the broadcast probes
  * side), so this is DYNAMIC partition pruning — the filter is a
  * DynamicPruningExpression resolved from the reused broadcast at
  * runtime, not a static literal. */
class IvfPersistPruningSpec extends SparkSpec {

  // AQE nests scans inside QueryStageExec wrappers that `collect` does
  // not descend into — walk them (and subqueries) explicitly
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other =>
        other.children.flatMap(allScans) ++ other.subqueries.flatMap(allScans)
    }

  private def assertPruned(df: org.apache.spark.sql.DataFrame,
      indexRoot: String, partCol: String): FileSourceScanExec = {
    df.collect() // execute so metrics populate
    val postingsScan = allScans(df.queryExecution.executedPlan).find { s =>
      s.relation.location.rootPaths.exists(_.toString.contains(indexRoot)) &&
        s.relation.location.rootPaths.exists(_.toString.contains("postings"))
    }.getOrElse(fail("no postings FileSourceScanExec in the executed plan"))

    assert(postingsScan.partitionFilters.map(_.toString.toLowerCase)
        .exists(f => f.contains(partCol) || f.contains("dynamicpruning")),
      s"postings scan has no $partCol partition filter: ${postingsScan.partitionFilters}")

    val totalFiles = postingsScan.relation.location.inputFiles.length
    val readFiles = postingsScan.metrics("numFiles").value
    assert(readFiles > 0, "scan read no files")
    assert(readFiles < totalFiles,
      s"scan read all $totalFiles postings files — partition pruning did not engage " +
        "(the inverted-file seek degraded to a full index scan)")
    postingsScan
  }

  test("q_knn_ivf_persist: postings scan carries a cell partition filter and prunes files") {
    assertPruned(Similarity.qKnnIvfPersist.build(spark, sf), "graft_ivf/", "cell")
  }

  test("q_knn_ivf2_persist: postings scan carries a leaf partition filter and prunes files") {
    assertPruned(Similarity.qKnnIvf2Persist.build(spark, sf), "graft_ivf2/", "leaf")
  }

  test("q_knn_lsh_persist: postings scan carries a tb_hi partition filter and prunes files") {
    assertPruned(Similarity.qKnnLshPersist.build(spark, sf), "graft_lsh/", "tb_hi")
  }

  test("q_knn_filtered_persist: label predicate pushed into the pruned postings scan") {
    val scan = assertPruned(
      Similarity.qKnnFilteredPersist.build(spark, sf), "graft_ivf/", "cell")
    // the label rides IN the postings layout, and the query batch's
    // label set is a static isin the scan itself carries — the
    // "label-in-postings" design completion, not a post-join residue
    assert(scan.dataFilters.map(_.toString.toLowerCase).exists(_.contains("label")),
      s"postings scan carries no pushed label filter: ${scan.dataFilters}")
  }

  test("q_hard_negatives_persist: serves off pruned label-carrying postings") {
    val scan = assertPruned(
      Similarity.qHardNegativesPersist.build(spark, sf), "graft_ivf/", "cell")
    // inequality vs a multi-label query batch: no useful static label
    // pushdown (the eligible set is the full domain) — but the label must
    // be read FROM the postings, not joined from a corpus sidecar
    assert(scan.schema.fieldNames.contains("label"),
      s"postings scan does not read the label column: ${scan.schema.fieldNames.toSeq}")
  }
}
