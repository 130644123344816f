package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class SrcDoc(doc_id: Long, text: String, source: String, ts: Timestamp)

class StreamCurationSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  // ≥50 chars, healthy stopword ratio — passes the quality gate
  private val good =
    "the quick brown fox jumps over the lazy dog and runs on through the field"

  test("quality gate and dedup curate a live feed like the batch pipeline") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[SrcDoc]
    val q = StreamCuration.curate(in.toDF(), horizon = "10 seconds")
      .writeStream.format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(
        SrcDoc(1, good, "srcA", ts(1000)),
        SrcDoc(2, "too short", "srcA", ts(1000)), // fails the length gate
        // ≥50 chars but zero stopwords → fails the ratio floor
        SrcDoc(3, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do", "srcB", ts(1000)))
      q.processAllAvailable()
      in.addData(
        SrcDoc(4, good.toUpperCase, "srcB", ts(2000)), // dup of 1 (case-insensitive fingerprint)
        SrcDoc(5, good + " again and again", "srcB", ts(2000)))
      q.processAllAvailable()

      val got = spark.table("curate_out").as[SrcDoc].collect().map(_.doc_id).toSet
      assert(got === Set(1L, 5L),
        s"expected low-quality 2/3 and duplicate 4 suppressed, got $got")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS curate_out")
    }
  }

  test("the windowed audit counts kept docs and tokens per source") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[SrcDoc]
    val q = StreamCuration.audit(
        StreamCuration.curate(in.toDF(), horizon = "2 seconds"),
        windowLen = "5 seconds")
      .writeStream.format("memory").queryName("audit_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(
        SrcDoc(1, good, "srcA", ts(1000)),
        SrcDoc(2, good.toUpperCase, "srcB", ts(1500)), // dup of 1 — dropped pre-audit
        SrcDoc(3, good + " more words here", "srcB", ts(2000)))
      q.processAllAvailable()
      // advance event time far past window end + watermark so the
      // [0s, 5s) window closes and its audit rows are emitted
      in.addData(SrcDoc(9, good + " closing the first window now", "srcA", ts(60000)))
      q.processAllAvailable()

      val rows = spark.table("audit_out").collect()
        .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
      // srcA kept doc 1 (15 word-tokens); srcB kept only doc 3 (dup dropped)
      assert(rows.get("srcA").map(_._1) === Some(1L), s"got $rows")
      assert(rows.get("srcB").map(_._1) === Some(1L), s"got $rows")
      assert(rows("srcA")._2 > 0 && rows("srcB")._2 > rows("srcA")._2,
        s"doc 3 has extra tokens vs doc 1: $rows")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS audit_out")
    }
  }
}
