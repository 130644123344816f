package graft.streaming

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The streaming CMS must equal the batch CMS bit-for-bit over the same
  * rows: counters are pure sums, so stateful streaming aggregation IS
  * the sketch merge and micro-batch boundaries cannot change a counter.
  * Also pins the state bound: the sketch never exceeds depth × width
  * rows no matter how many tokens flow through. */
class StreamCmsSpec extends SparkSpec {

  test("streamed sketch ≡ batch sketch; state bounded by depth × width") {
    val s = spark
    // batch twin over the same documents
    val expect = StreamCms.sketch(Tables.documents(s, sf).select(col("text")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted

    val tablePath = s"$sf/documents.parquet"
    val reader = s.readStream.schema(Tables.documents(s, sf).schema)
    val src =
      if (new java.io.File(tablePath).isDirectory) reader.parquet(tablePath)
      else reader.option("pathGlobFilter", "documents.parquet").parquet(sf)
    val q = StreamCms.sketch(src.select(col("text")))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory")
      .queryName("stream_cms")
      .start()
    q.awaitTermination()

    val got = s.table("stream_cms")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.nonEmpty)
    assert(got.length <= graft.operators.Features.CmsDepth *
      graft.operators.Features.CmsWidth,
      s"sketch state exceeded depth × width: ${got.length}")
    assert(got === expect, "streamed CMS diverged from the batch sketch")
  }
}
