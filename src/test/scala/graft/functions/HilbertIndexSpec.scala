package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HilbertIndexSpec extends SparkSpec {

  test("index/cell are inverse bijections on sample cells") {
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L), (32768L, 1L))
    samples.foreach { case (x, y) =>
      val d = HilbertIndex.index(x, y)
      assert(HilbertIndex.cell(d) == ((x, y)), s"cell(index($x,$y)) diverged")
    }
    // distinct cells → distinct indices
    assert(samples.map((HilbertIndex.index _).tupled).distinct.size == samples.size)
  }

  test("consecutive indices are always grid neighbors (the locality property)") {
    (0L until 4096L).foreach { d =>
      val (x1, y1) = HilbertIndex.cell(d)
      val (x2, y2) = HilbertIndex.cell(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("codegen'd expression matches the interpreted reference, via SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq((0L, 0L), (65535L, 0L), (12345L, 54321L), (777L, 888L))
    rows.toDF("x", "y").createOrReplaceTempView("hilbert_in")
    val got = spark.sql("SELECT x, y, graft_hilbert(x, y) AS h FROM hilbert_in")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == HilbertIndex.index(x, y), s"mismatch at ($x,$y)")
    }
  }
}
