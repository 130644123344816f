package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity

/** The streaming frozen-index assignment must be indistinguishable from
  * the batch path: same kernel, same frozen index, so replaying the
  * corpus through the file-source stream yields row-for-row the batch
  * gate's output (both additionally face the identical DuckDB oracle in
  * the driver gate). */
class StreamAnnSpec extends SparkSpec {

  test("stream-assign equals batch-assign row-for-row at sf0.001") {
    val batch = Similarity.qKnnIncrAssign.build(spark, sf)
      .orderBy("vec_id").collect().toSeq
    val streamed = Similarity.qKnnStreamAssign.build(spark, sf)
      .orderBy("vec_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("assignment audit flags disagreement rows, never drops them") {
    val out = Similarity.qKnnStreamAssign.build(spark, sf)
    val n = out.count()
    val nBatch = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 0).count()
    assert(n == nBatch) // every new vector is assigned exactly once
  }
}
