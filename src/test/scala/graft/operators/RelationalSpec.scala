package graft.operators

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct within 10% of exact") {
    val rows = Relational.qApproxDistinct.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / math.max(exact, 1) <= 0.1,
        s"${r.getString(0)}: exact=$exact approx=$approx")
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
}
