package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered per-module in graft.operators.* as [[Q]] values;
  * this object only aggregates them.
  */
object SparkEntry {

  /** Every registered query, across all operator modules. */
  def registry: Seq[Q] =
    operators.Relational.all ++ operators.Analytic.all ++
      operators.TextAnalysis.all ++ operators.Dedup.all ++
      operators.Similarity.all ++ operators.GeneratorQueries.all ++
      operators.Multimodal.all ++ operators.RefLogs.all ++
      operators.Layout.all ++ operators.Features.all

  /** Flagship: the reference's full pipeline in batch form — plan-driven
    * generator → Hanoi CPU workload → per-(value, stream) stats. Driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val plan = plans.PlanParser.parse(
      "sequence = [ { type = fixed, value = 7, rate = 1000, duration = 2 } ]")
    streaming.StreamingStats.batchStats(
      streaming.StreamingStats.withHanoiCost(
        sources.PlanGenerator.generate(spark, plan)))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
