package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Invariants for the feature-engineering/data-quality family: CDC merge
  * semantics, closed-form decay weights, planted-outlier detection, known
  * entropies, and the heavy-hitter threshold. The value-exact cross-engine
  * checks are the DuckDB gates; these pin the SEMANTICS on hand-built
  * inputs where the expected answer is arithmetic, not another query. */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("merge_upsert: deletes gone, inserts present, updates shifted +100") {
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val merged = Features.mergeChanges(base, Features.changesBatch(base)).cache()
    try {
      assert(merged.filter(col("c_custkey") % 10 === 2 &&
        col("c_custkey") < 1000000).count() === 0)
      val nIns = base.filter(col("c_custkey") % 10 === 3).count()
      assert(merged.filter(col("c_custkey") >= 1000000).count() === nIns)
      // updated rows: merged bal − round(base bal, 2) = 100 exactly
      val upd = merged.filter(col("c_custkey") % 10 === 1 && col("c_custkey") < 1000000)
        .join(base.select(col("c_custkey"), round(col("c_acctbal"), 2).as("old_bal")),
          "c_custkey")
      assert(upd.filter(abs(col("acctbal") - col("old_bal") - 100) > 1e-9).count() === 0)
      // row accounting: base − deletes + inserts
      val nBase = base.count()
      val nDel = base.filter(col("c_custkey") % 10 === 2).count()
      assert(merged.count() === nBase - nDel + nIns)
    } finally merged.unpersist()
  }

  test("snapshot diff recovers the changes batch that produced the merge") {
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val diff = Features.diffSnapshots(
      base.select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal")),
      Features.mergeChanges(base, Features.changesBatch(base))
        .select(col("c_custkey"), col("acctbal")))
      .select(col("c_custkey"), col("op"))
    val expected = Features.changesBatch(base)
      .select(col("k").as("c_custkey"), col("op"))
    // exact op-by-key equality in both directions
    assert(diff.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(diff).count() === 0)
  }

  test("time_decay: closed-form half-life weights") {
    // one user, value 10 at ages 0 h and 1 h → 10·1 + 10·0.5 = 15
    val ev = Seq((1L, 10.0, 7200L), (1L, 10.0, 3600L)).toDF("user_id", "value", "secs")
    val row = Features.timeDecay(ev).collect().head
    assert(row.getAs[Long]("n_events") === 2L)
    assert(row.getAs[Double]("decayed_value") === 15.0)
    // sub-hour ages floor to 0 → undecayed
    val ev2 = Seq((1L, 4.0, 100L), (1L, 6.0, 3599L)).toDF("user_id", "value", "secs")
    assert(Features.timeDecay(ev2).collect().head.getAs[Double]("decayed_value") === 10.0)
  }

  test("quantile_bins_approx: sketch edges and bin counts inside bounds") {
    val rows = Features.qQuantileBinsApprox.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("ok_edges") === 1, s"edge out of rank bound: $r")
      assert(r.getAs[Int]("ok_counts") === 1, s"bin count out of bound: $r")
    }
    // n must reconcile with the raw table — the binning pass drops nothing
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.events(spark, sf).count(), s"row loss: $total")
  }

  test("outliers: planted 3-MAD violator is the only flag") {
    val ev = Seq(("a", 9.0), ("a", 10.0), ("a", 10.0), ("a", 11.0), ("a", 1000.0))
      .toDF("event_type", "value")
    // med 10, devs {1,0,0,1,990}, mad 1 → only 990 > 3
    val row = Features.outliers(ev).collect().head
    assert(row.getAs[Double]("med") === 10.0)
    assert(row.getAs[Double]("mad") === 1.0)
    assert(row.getAs[Long]("n") === 5L)
    assert(row.getAs[Long]("n_outliers") === 1L)
  }

  test("char_entropy: known distributions") {
    val docs = Seq((1L, "aabb"), (2L, "abcd"), (3L, "aaaa"))
      .toDF("doc_id", "text")
    val m = Features.charEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(m(1L) === 1.0)   // two symbols, uniform
    assert(m(2L) === 2.0)   // four symbols, uniform
    assert(m(3L) === 0.0)   // degenerate
  }

  test("heavy hitters: relative threshold is strict") {
    // 2000 tokens: "hot" ×3 (0.15%) kept; "warm" ×2 (0.1%) is NOT > 0.1%
    val filler = (1 to 1995).map(i => s"w$i").mkString(" ")
    val docs = Seq(s"hot hot hot warm warm $filler").toDF("text")
    val hits = Features.heavyHitters(docs).collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Long]("cnt")).toMap
    assert(hits.get("hot").contains(3L))
    assert(!hits.contains("warm"))
    assert(!hits.contains("w1"))
  }

  test("quality gate: rank-selected per-source p25 drops the bottom quarter") {
    // 8 docs, scores 0/8 .. 7/8 of words being "the": rank ceil(8/4)=2 →
    // threshold = 2nd-lowest score (1/8) → exactly the 0-score doc drops
    def txt(nStop: Int) = ((1 to nStop).map(_ => "the") ++
      (1 to (8 - nStop)).map(i => s"x$i")).mkString(" ")
    val docs = (0 until 8).map(i => (i.toLong, "s1", txt(i)))
      .toDF("doc_id", "source", "text")
    val kept = Features.qualityGate(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept === (1L to 7L).toSet)
    // a second source thresholds independently: its uniform scores all keep
    val two = docs.unionByName(
      (10 until 14).map(i => (i.toLong, "s2", txt(4))).toDF("doc_id", "source", "text"))
    val bySrc = Features.qualityGate(two).collect()
      .groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(bySrc === Map("s1" -> 7, "s2" -> 4))
  }

  test("type drift: hand-computed KL for a two-day shape change") {
    // day1 p=(.5,.5) → day2 p=(.75,.25): KL = .75·log2(1.5) − .25 ≈ 0.188722
    val ev = Seq(
      ("2024-01-01 10:00:00", "A"), ("2024-01-01 11:00:00", "A"),
      ("2024-01-01 10:00:00", "B"), ("2024-01-01 11:00:00", "B"),
      ("2024-01-02 10:00:00", "A"), ("2024-01-02 11:00:00", "A"),
      ("2024-01-02 12:00:00", "A"), ("2024-01-02 13:00:00", "B"))
      .toDF("s", "event_type")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"))
    val rows = Features.typeDrift(ev).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[java.sql.Date]("day").toString === "2024-01-02")
    assert(r.getAs[Double]("drift") === 0.188722)
    assert(r.getAs[Long]("n_types") === 2L)
  }

  test("quantile bins: 1..100 splits into ten clean deciles") {
    val ev = (1 to 100).map(i => (i.toLong, "t", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val bins = Features.quantileBins(ev).collect()
      .map(r => r.getAs[Int]("decile") ->
        ((r.getAs[Long]("cnt"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))).toMap
    assert(bins.size === 10)
    (1 to 10).foreach { d =>
      assert(bins(d) === ((10L, (d - 1) * 10 + 1.0, d * 10.0)))
    }
  }

  test("pmi: perfectly-associated pair scores log2(n/c), independence scores 0") {
    // aaa+bbb always together in half the docs; ccc+ddd in the other half
    val docs = Seq((1L, "aaa bbb"), (2L, "aaa bbb"), (3L, "ccc ddd"), (4L, "ccc ddd"))
      .toDF("doc_id", "text")
    val m = Features.pmiCooc(docs).collect()
      .map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b")) ->
        r.getAs[Double]("pmi")).toMap
    // PMI = log2(c·n / (df_a·df_b)) = log2(2·4 / (2·2)) = 1
    assert(m === Map(("aaa", "bbb") -> 1.0, ("ccc", "ddd") -> 1.0))
    // independent tokens: in every doc → PMI log2(4·4/(4·4)) = 0, and the
    // c_ab·4 >= n threshold keeps them
    val ind = Seq((1L, "aaa bbb"), (2L, "aaa bbb"), (3L, "aaa bbb"), (4L, "aaa bbb"))
      .toDF("doc_id", "text")
    val m2 = Features.pmiCooc(ind).collect()
      .map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b")) ->
        r.getAs[Double]("pmi")).toMap
    assert(m2 === Map(("aaa", "bbb") -> 0.0))
  }

  test("pmi: df floor pushdown prunes rare tokens without touching survivors") {
    // aaa+bbb co-occur in all 8 docs; rare1/rare2 appear once (df·4 = 4 < 8)
    // so the pushdown removes them before pairing — output pairs and PMI
    // values are identical to the corpus without the rare tokens
    val docs = (Seq((1L, "aaa bbb rare1 rare2")) ++
      (2 to 8).map(i => (i.toLong, "aaa bbb")))
      .toDF("doc_id", "text")
    val m = Features.pmiCooc(docs).collect()
      .map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b")) ->
        r.getAs[Double]("pmi")).toMap
    assert(m === Map(("aaa", "bbb") -> 0.0))
  }

  test("seqBatches is shuffle-free: no single-partition Exchange/Sort in the plan") {
    // the CDC / time-travel gates' batch shaping must stay a pure per-row
    // expression — the round-12 ntile(4) OVER (ORDER BY seq) version was a
    // global sort that a scaled replay of the gate would serialize on
    val log = (1L to 100L).toDF("seq")
    val plan = Features.seqBatches(log, "seq").queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"batch assignment must not global-shuffle:\n$plan")
    assert(!plan.contains("Exchange"),
      s"batch assignment must be a pure per-row expression:\n$plan")
    // and the assignment itself covers all 4 batches, 1-based
    val bs = Features.seqBatches(log, "seq")
      .select("b").distinct().collect().map(_.getInt(0)).sorted
    assert(bs === Array(1, 2, 3, 4))
  }
}
