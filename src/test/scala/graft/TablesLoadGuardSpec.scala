package graft

import org.apache.spark.sql.DataFrame

/** Pins the SCALE-ADAPTIVE shape of [[Tables.load]]'s unsplittable-scan
  * repartition (r16 optimization, VERDICT r16 next-round #7): the
  * round-robin exchange exists ONLY when the scan cannot reach half the
  * session's cores by splitting (`bytes / maxPartitionBytes < dp / 2`).
  * At cluster scale — any real multi-split table — that predicate is
  * false and the plan must carry NO repartition, so the local-mode
  * allowlist can never leak a pointless exchange into a real deployment.
  */
class TablesLoadGuardSpec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.1" // documents.parquet ≈ 581 KB ≥ the 512 KB floor

  private def hasRoundRobin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }.nonEmpty

  private def withMaxSplit[A](bytes: Long)(f: => A): A = {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try f finally spark.conf.set(key, prev)
  }

  test("local-mode shape (one unsplittable file): allowlisted table gets the round-robin exchange") {
    // default 128 MB split: the whole table is 1 scan task, far under
    // dp/2 — the measured-allowlist repartition must fire
    assert(hasRoundRobin(Tables.documents(spark, Sf01)),
      "sub-split documents scan must be repartitioned to defaultParallelism")
  }

  test("cluster-scale shape (scan splits to >= dp/2 tasks): NO round-robin exchange") {
    // 128 KB splits: 581 KB / 128 KB = 4 splits >= dp/2 (= 2 on the
    // local[4] test session) — the guard must drop the exchange exactly
    // where a real deployment's multi-split table would
    withMaxSplit(128L * 1024) {
      assert(!hasRoundRobin(Tables.documents(spark, Sf01)),
        "a scan that splits to >= dp/2 tasks must NOT pay a repartition exchange")
    }
  }

  test("sub-floor tables never repartition; non-allowlisted tables never repartition") {
    // documents at sf0.001 is ~64 KB < the 512 KB floor
    assert(!hasRoundRobin(Tables.documents(spark, SparkSpec.Sf0001)),
      "sub-512KB table must not pay an exchange")
    // lineitem is NOT on the measured allowlist at any size
    assert(!hasRoundRobin(Tables.lineitem(spark, Sf01)),
      "non-allowlisted table must not be repartitioned")
  }

  test("filters and pruning push through the allowlist repartition") {
    import org.apache.spark.sql.functions.col
    val df = Tables.documents(spark, Sf01).filter(col("lang") === "en")
      .select("doc_id", "lang")
    // formatted explain reaches inside the AQE wrapper that hides the
    // scan node from a plain executedPlan.collect
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("RoundRobinPartitioning"),
      s"expected the allowlist repartition in:\n$plan")
    assert(plan.contains("EqualTo(lang,en)"),
      s"filter must reach the scan (PushedFilters):\n$plan")
    val read = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("lang") && !read.contains("text"),
      s"column pruning must reach the scan: $read")
  }
}
