package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Relational

/** Native as-of join: edge semantics on crafted rows, bit-parity with the
  * union+window formulation on real data, and the physical plan must be
  * the dedicated merge exec fed by co-partitioned sorted children. */
class AsOfJoinSpec extends SparkSpec {

  test("crafted rows: inclusive match, no-match nulls, per-key isolation") {
    import spark.implicits._
    val quotes = Seq( // key, time, px
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 5L, 11.5), ("B", 3L, 20.0))
      .toDF("sym", "qt", "px")
      .select(col("sym").as("q_sym"), col("qt"), col("px"),
        struct(col("qt"), col("px")).as("rtime"))
    val trades = Seq(
      ("A", 0L), ("A", 1L), ("A", 5L), ("A", 9L), ("B", 2L), ("B", 99L), ("C", 4L))
      .toDF("sym", "tt")
      .select(col("sym"), col("tt"), struct(col("tt"), lit(Double.MaxValue)).as("ltime"))
    val got = AsOfJoin.join(trades, quotes, "sym", "q_sym", "ltime", "rtime")
      .select("sym", "tt", "qt", "px")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(got === Set(
      ("A", 0L, null, null),   // before first quote
      ("A", 1L, 1L, 10.0),     // inclusive at-or-before
      ("A", 5L, 5L, 11.5),     // tie on time: greatest (qt, px) wins
      ("A", 9L, 5L, 11.5),     // holds last quote forward
      ("B", 2L, null, null),   // B's quote is later
      ("B", 99L, 3L, 20.0),
      ("C", 4L, null, null)))  // key with no right rows at all
  }

  test("null keys and null times never match (SQL semantics, not null==null)") {
    import spark.implicits._
    val right = Seq((Some("A"), Some(1L)), (None, Some(2L)), (Some("B"), None))
      .toDF("rk", "rt")
    val left = Seq(
      (1L, Some("A"), Some(5L)), // normal match
      (2L, None, Some(5L)),      // null key: no match even vs null-key right
      (3L, Some("B"), Some(5L)), // only right row for B has null time: no match
      (4L, Some("A"), None))     // null time: no match
      .toDF("id", "lk", "lt")
    val got = AsOfJoin.join(left, right, "lk", "rk", "lt", "rt")
      .select("id", "rt")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(got === Map(1L -> 1L, 2L -> null, 3L -> null, 4L -> null))
  }

  test("bit-parity with the union+window formulation at sf0.001") {
    val native = Relational.qAsOfNative.build(spark, sf)
    val window = Relational.qAsOfJoin.build(spark, sf)
    assert(native.count() === window.count())
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("physical plan is the merge exec over co-partitioned sorted children") {
    val plan = Relational.qAsOfNative.build(spark, sf).queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsOfJoin"), s)
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"))
    // EnsureRequirements must have inserted hash exchanges + sorts for both
    // children (co-partitioning on the key, (key, time) sort)
    assert("Exchange hashpartitioning".r.findAllIn(s).size >= 2, s)
    assert("\\bSort \\[".r.findAllIn(s).size >= 2, s)
  }
}
