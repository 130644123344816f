package graft.operators

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct within its 4-sigma bound (gate flag green)") {
    val rows = Relational.qApproxDistinct.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: empty group")
      assert(r.getInt(2) == 1,
        s"${r.getString(0)}: sketch outside bound (exact=${r.getLong(1)})")
    }
  }

  test("range join covers every order exactly once") {
    val total = Relational.qRangeJoin.build(spark, sf).collect().map(_.getLong(1)).sum
    val orders = graft.Tables.orders(spark, sf).count()
    assert(total == orders, s"band join dropped/duplicated rows: $total vs $orders")
  }

  test("cube emits the full lattice (4 grouping combinations)") {
    val rows = Relational.qCube.build(spark, sf).collect()
    val hasGrand = rows.exists(r => r.isNullAt(0) && r.isNullAt(1))
    val hasStatusOnly = rows.exists(r => !r.isNullAt(0) && r.isNullAt(1))
    val hasPrioOnly = rows.exists(r => r.isNullAt(0) && !r.isNullAt(1))
    val hasBoth = rows.exists(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(hasGrand && hasStatusOnly && hasPrioOnly && hasBoth)
  }

  test("bloom prefilter: zero false negatives, bounded false positives") {
    import org.apache.spark.sql.functions._
    val orders = graft.Tables.orders(spark, sf)
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = Relational.buildBloom(urgent, col("o_orderkey"), 100000L, 1600000L)

    val fact = graft.Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val trueMatches = fact.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .count()
    val survivors = Relational.bloomPrefilter(fact, col("l_orderkey"), bloom)
    // no false negatives: every true match survives the prefilter
    val survivingMatches = survivors
      .join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    assert(survivingMatches == trueMatches,
      s"bloom dropped true matches: $survivingMatches vs $trueMatches")
    // selectivity: non-matching rows mostly pruned (FPP far under 10%)
    val nonMatching = fact.count() - trueMatches
    val falsePositives = survivors.count() - trueMatches
    assert(falsePositives.toDouble / math.max(nonMatching, 1) < 0.1,
      s"bloom passed $falsePositives of $nonMatching non-matching rows")
  }

  test("incremental rollup merge is bit-identical to the full recompute") {
    import org.apache.spark.sql.functions._
    val merged = Analytic.qIncrRollup.build(spark, sf)
    // The direct aggregation the merge must be indistinguishable from —
    // same projection/casts as the gate's oracle SQL.
    val direct = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("event_type"), col("day"), col("cnt"),
        round(col("sum_value").cast("double"), 6).as("sum_value"))
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getDate(1).toString)
    val m = merged.collect().map(r => key(r) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val d = direct.collect().map(r => key(r) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m.keySet == d.keySet, "merge changed the group key set")
    // Delta-only groups must survive the full-outer merge: the delta split
    // (event_id % 10 == 0) owns some (type, day) cells outright at sf0.001.
    m.foreach { case (k, v) =>
      assert(d(k) == v, s"group $k: $v vs ${d(k)}")
    }
  }
}
