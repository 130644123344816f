package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Binned range join: the library helper and the optimizer rule must both
  * produce exactly the naive join's rows, and the rule must turn the
  * nested-loop plan into an equi-join on the bin key.
  *
  * The rule is exercised through `spark.experimental.extraOptimizations`
  * (the public per-session hook — the shared test session already exists,
  * so the static `spark.sql.extensions` conf can't be applied here;
  * GraftExtensions installs the same rule object for fresh sessions).
  */
class BinnedRangeJoinSpec extends SparkSpec {

  private def fixtures(): Unit = {
    import spark.implicits._
    // points 0..999; intervals of assorted widths, including empty
    // (lo > hi), degenerate (lo == hi), and bin-straddling ones
    (0 until 1000).map(i => (i.toLong, i * 1.0)).toDF("pid", "pt")
      .createOrReplaceTempView("pts")
    Seq(
      (1L, 10.0, 25.0), (2L, 17.5, 17.5), (3L, 40.0, 30.0),
      (4L, 995.0, 2000.0), (5L, -50.0, 3.0), (6L, 333.3, 334.2),
      (7L, 0.0, 999.0)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("ivs")
  }

  private val naiveSql =
    """SELECT pid, iid FROM pts JOIN ivs ON pt >= lo AND pt <= hi"""

  private def withRule[A](binWidth: String)(body: => A): A = {
    spark.experimental.extraOptimizations = Seq(BinRangeJoinRule(spark))
    spark.conf.set(BinnedRangeJoin.BinWidthKey, binWidth)
    try body
    finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(BinnedRangeJoin.BinWidthKey)
    }
  }

  test("library helper matches the naive join exactly") {
    fixtures()
    val expected = spark.sql(naiveSql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = BinnedRangeJoin.join(
        spark.table("pts"), spark.table("ivs"), col("pt"), col("lo"), col("hi"),
        binWidth = 8.0, inclusiveHi = true)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
    // sanity on the fixture: the empty interval matches nothing, the
    // degenerate one matches nothing (17.5 is not an integer point), the
    // full-range one matches every point
    assert(!expected.exists(_._2 == 3L) && !expected.exists(_._2 == 2L))
    assert(expected.count(_._2 == 7L) === 1000)
  }

  test("optimizer rule rewrites a plain SQL range join to a bin equi-join") {
    fixtures()
    val expected = spark.sql(naiveSql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule("8.0") {
      val df = spark.sql(naiveSql)
      // the binned branch must be an equi-join on the bin key; the plan
      // ALSO contains the outlier fallback (nested-loop over the
      // narrow=false residue — empty here, and elided at runtime by AQE's
      // empty-relation propagation), so assert the hash join EXISTS
      // rather than that nested-loop is absent
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("HashJoin") || physical.contains("SortMergeJoin"),
        s"rule did not fire — no equi-join in plan:\n$physical")
      assert(physical.contains("__graft_pt_bin"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
    }
  }

  test("rule leaves joins with an equi conjunct untouched") {
    fixtures()
    withRule("8.0") {
      // equi conjunct present: Spark already hash-joins this; the rule
      // must not add a bin stage (no sequence/explode in the plan)
      val equi = spark.sql(
        "SELECT pid, iid FROM pts JOIN ivs ON pid = iid AND pt >= lo AND pt <= hi")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("sequence("))
      // only iid 7 has pt(7)=7.0 inside its own interval [0, 999]
      assert(equi.collect().map(r => r.getLong(1)).toSeq === Seq(7L))
    }
  }

  test("rule handles mixed-type bounds (int lo, double hi)") {
    import spark.implicits._
    (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("pid", "pt")
      .createOrReplaceTempView("mpts")
    // lo is INT, hi is DOUBLE: the two bounds never get coerced to a
    // common type by the analyzer (each is only coerced against pt)
    Seq((1L, 10, 25.5), (2L, 90, 14.0)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("mivs")
    val sql = "SELECT pid, iid FROM mpts JOIN mivs ON pt >= lo AND pt <= hi"
    val expected = spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule("8.0") {
      val df = spark.sql(sql)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("HashJoin") || physical.contains("SortMergeJoin"))
      assert(physical.contains("__graft_pt_bin"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
      assert(expected.size === 16) // 10..25 inclusive; empty interval drops
    }
  }

  test("library helper routes non-finite and ultra-wide intervals to the fallback") {
    import spark.implicits._
    val pts = (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("pid", "pt")
    // hi = +Infinity would floor-cast to Long.MaxValue and make sequence()
    // throw; the 1e9-wide interval would emit ~1e8 bins at width 8. Both
    // must take the nested-loop branch and still match correctly.
    val ivs = Seq(
      (1L, 10.0, 12.0),                       // narrow: binned branch
      (2L, 50.0, Double.PositiveInfinity),    // non-finite hi
      (3L, Double.NegativeInfinity, 3.0),     // non-finite lo
      (4L, 0.0, 1e9),                         // finite but ultra-wide
      (5L, Double.NaN, 20.0)                  // NaN matches nothing
    ).toDF("iid", "lo", "hi")
    val got = BinnedRangeJoin.join(pts, ivs, col("pt"), col("lo"), col("hi"),
        binWidth = 8.0, inclusiveHi = true)
      .groupBy("iid").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.get(1L).contains(3L))    // 10, 11, 12
    assert(got.get(2L).contains(50L))   // 50..99
    assert(got.get(3L).contains(4L))    // 0..3
    assert(got.get(4L).contains(100L))  // all
    assert(!got.contains(5L))           // NaN lo: matches nothing
  }

  test("optimizer rule routes outlier intervals to a tagged fallback join") {
    import spark.implicits._
    (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("pid", "pt")
      .createOrReplaceTempView("opts")
    Seq((1L, 10.0, 12.0), (2L, 50.0, Double.PositiveInfinity), (3L, 0.0, 1e9))
      .toDF("iid", "lo", "hi").createOrReplaceTempView("oivs")
    val sql = "SELECT pid, iid FROM opts JOIN oivs ON pt >= lo AND pt <= hi"
    val expected = spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.size === 3 + 50 + 100)
    withRule("8.0") {
      val df = spark.sql(sql)
      // both branches present: the bin equi-join AND one nested-loop
      // fallback (which the NoRebin tag must keep from re-expanding —
      // unbounded re-rewrites would blow the fixed-point iteration limit)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("Union"))
      assert(physical.contains("BroadcastNestedLoopJoin") ||
        physical.contains("CartesianProduct"))
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    }
  }

  test("structural guard blocks fallback re-rewrite even when tags are lost") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    fixtures()
    withRule("8.0") {
      val rule = BinRangeJoinRule(spark)
      val analyzed = spark.sql(naiveSql).queryExecution.analyzed
      val once = rule(analyzed)
      def joins(p: LogicalPlan): Int = p.collect { case j: Join => j }.size
      assert(joins(once) === 2, "expected the binned join + one fallback join")
      // Strip the tag from every Join — the state a sibling optimizer rule
      // leaves behind when it reconstructs a Join via bare constructor or
      // case-class copy() (transform*/makeCopy re-copy tags, but direct
      // construction does not). The structural guard must still recognize
      // the rule's own outlier-filter shape and leave the fallback alone.
      val stripped = once
      stripped.foreach {
        case j: Join => j.unsetTagValue(BinRangeJoinRule.NoRebin)
        case _ => ()
      }
      assert(stripped.collect { case j: Join => j }
        .forall(_.getTagValue(BinRangeJoinRule.NoRebin).isEmpty),
        "tags should be stripped (precondition of this test)")
      val twice = rule(stripped)
      assert(joins(twice) === joins(once),
        s"rule re-rewrote its own fallback after tag loss:\n$twice")
    }
  }

  test("rule is a no-op when the bin width conf is unset") {
    fixtures()
    spark.experimental.extraOptimizations = Seq(BinRangeJoinRule(spark))
    try {
      val physical = spark.sql(naiveSql).queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastNestedLoopJoin") ||
        physical.contains("CartesianProduct"))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
