package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class PageView(user_id: Long, page: String, ts: Timestamp)

/** Stream-static enrichment join + observe() telemetry: the two streaming
  * surfaces added alongside the stateful family — stateless per-batch dim
  * decoration and accumulator-backed pipeline counters. */
class StreamEnrichSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  test("stream-static join decorates each batch; missing dims leave null holes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[PageView]
    val q = StreamJoin.enrichStatic(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(
        PageView(1, "home", ts(1000)),
        PageView(2, "docs", ts(1100)),
        PageView(7, "home", ts(1200))) // no dim row → null tier
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
        .map(r => r.getAs[Long]("user_id") -> Option(r.getAs[String]("tier"))).toMap
      assert(rows === Map(1L -> Some("gold"), 2L -> Some("silver"), 7L -> None))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS enrich_out")
    }
  }

  test("observed curation reports in/kept counters per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val good =
      "the quick brown fox jumps over the lazy dog and runs on through the field"
    val in = MemoryStream[SrcDoc]
    val q = StreamCuration.curateObserved(in.toDF(), horizon = "10 seconds")
      .writeStream.format("memory").queryName("observed_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(
        SrcDoc(1, good, "srcA", ts(1000)),
        SrcDoc(2, "too short", "srcA", ts(1000)),
        SrcDoc(3, good + " with a few extra words", "srcB", ts(1500)))
      q.processAllAvailable()

      val metrics = q.recentProgress.toSeq
      def total(name: String, field: String): Long =
        metrics.flatMap(p => Option(p.observedMetrics.get(name)))
          .map(_.getAs[Long](field)).sum
      // all three entered; the too-short doc was gated out
      assert(total("curation_in", "rows_in") === 3L)
      assert(total("curation_in", "chars_in") > 0L)
      assert(total("curation_kept", "rows_kept") === 2L)
      assert(spark.table("observed_out").count() === 2L)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS observed_out")
    }
  }
}
