package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("z-order tiles bound BOTH dimensions; single-column sort bounds one") {
    val tiles = Layout.qZorderLayout.build(spark, sf).collect()
    assert(tiles.nonEmpty)
    // the pruning guarantee: every 256x256 tile's span is bounded in both dims
    tiles.foreach { t =>
      assert(t.getLong(2) <= 255, s"tile ${t.getLong(0)}: custkey span ${t.getLong(2)}")
      assert(t.getLong(3) <= 255, s"tile ${t.getLong(0)}: day span ${t.getLong(3)}")
    }

    // contrast: bucketing the same rows by custkey alone (the single-column
    // sort layout) leaves the date dimension unclustered — a date-predicate
    // scan prunes nothing
    val z = graft.Tables.orders(spark, sf).select(
      col("o_custkey").cast("long").as("x"),
      datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("y"))
    val oneCol = z.groupBy((col("x") / 8).cast("long").as("bucket"))
      .agg((max(col("y")) - min(col("y"))).as("day_span"))
      .collect().map(_.getLong(1))
    val fullRange = z.agg(max(col("y")) - min(col("y"))).collect().head.getLong(0)
    val avgOneCol = oneCol.sum.toDouble / oneCol.length
    assert(avgOneCol > fullRange * 0.8,
      s"expected custkey-sorted buckets to span ~the full date range " +
        s"($avgOneCol vs $fullRange) — the z-order contrast is meaningless otherwise")
  }

  test("zkey column and oracle bit-interleave agree on round-trip values") {
    import spark.implicits._
    // interleave then de-interleave: zkey is a bijection on 16-bit pairs
    val probe = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L)).toDF("x", "y")
    val got = probe.withColumn("z", Layout.zkey(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, zv) =>
      var dx = 0L; var dy = 0L
      (0 until 16).foreach { i =>
        dx |= ((zv >> (2 * i)) & 1L) << i
        dy |= ((zv >> (2 * i + 1)) & 1L) << i
      }
      assert(dx == x && dy == y, s"zkey($x,$y)=$zv de-interleaved to ($dx,$dy)")
    }
  }
}
