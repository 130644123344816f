package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketing: the co-located-join technique — pre-shuffling both fact
  * tables into the same bucket layout at write time buys every later join
  * on that key a zero-Exchange plan. The spec proves the claim the SCALE
  * notes make: same results as the shuffled join, with NO Exchange
  * feeding the join. */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables runs without any Exchange") {
    val dir = Files.createTempDirectory("graft_buckets").toFile.getAbsolutePath
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    val bcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-family join path: at spec scale the dim side
      // would broadcast and the bucket layout would never be consulted
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      orders.write.format("parquet")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$dir/b_orders").saveAsTable("b_orders")
      customer.write.format("parquet")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$dir/b_customer").saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))

      val physical = joined.queryExecution.executedPlan.toString
      // both sides feed the join straight from the bucketed scans
      assert(!physical.contains("Exchange"), physical)
      assert(physical.contains("SelectedBucketsCount"), physical)

      // and the answer matches the plain shuffled join
      def summarize(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("total"))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
      val expected = summarize(
        orders.join(customer, col("o_custkey") === col("c_custkey")))
      val got = summarize(joined)
      assert(got.keySet === expected.keySet)
      got.foreach { case (seg, (cnt, total)) =>
        assert(cnt === expected(seg)._1)
        // double sums accumulate in different orders across the two plans
        assert(math.abs(total - expected(seg)._2) < 1e-6 * math.abs(total))
      }
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcastBefore)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("q_bucketed_join gate: merge join over buckets, single exchange total") {
    val df = Layout.qBucketedJoin.build(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("SortMergeJoin"), physical)
    assert(physical.contains("SelectedBucketsCount"), physical)
    // the ONLY exchange is the final group-by; the join itself is carried
    // entirely by the co-bucketed layout
    val exchanges = "Exchange".r.findAllIn(physical).length
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges:\n$physical")
    assert(df.count() > 0)
  }
}
