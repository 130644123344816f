package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** The chained streaming ANN production path (ingest → shard-route to
  * disk → assign into the persisted ivf2 leaf index): per-batch results
  * must be IDENTICAL to pushing the same rows through the same frozen
  * index in one batch — routing through disk and micro-batching must not
  * change one assignment bit (assignment is a pure per-row function of
  * the frozen codebook; the landed files round-trip losslessly). */
class StreamAnnIngestSpec extends SparkSpec {

  test("stream route+assign ≡ batch assign against the persisted ivf2 leaf codebook") {
    val s = spark
    val cents = Similarity.ivf2LeafCentroids(s, sf).localCheckpoint()
    val emb = Tables.embeddings(s, sf)
      .withColumn("doc_id", col("vec_id"))
      .withColumn("label", (col("vec_id") % 8).cast("int"))
      .select("doc_id", "vec_id", "label", "embedding")

    // batch twin: everything in one pass
    val expect = StreamAnn.assign(emb, cents).collect()
      .map(r => (r.getLong(0), r.get(2), r.getDouble(3))).sortBy(_._1)

    // streaming path: file-source replay, each micro-batch through the
    // full ingestStep (land shard-partitioned, read back, assign)
    val outDir = Files.createTempDirectory("graft_annspec").toFile
    try {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Row]
      val tablePath = s"$sf/embeddings.parquet"
      val reader = s.readStream.schema(Tables.embeddings(s, sf).schema)
      val src =
        if (new java.io.File(tablePath).isDirectory) reader.parquet(tablePath)
        else reader.option("pathGlobFilter", "embeddings.parquet").parquet(sf)
      val q = src
        .withColumn("doc_id", col("vec_id"))
        .withColumn("label", (col("vec_id") % 8).cast("int"))
        .select("doc_id", "vec_id", "label", "embedding")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          StreamAnnIngest.ingestStep(b, cents, outDir.getAbsolutePath, id)
            .collect().foreach(got.add)
          ()
        }
        .start()
      q.awaitTermination()

      import scala.jdk.CollectionConverters._
      val gotSorted = got.asScala.toSeq
        .map(r => (r.getLong(0), r.get(2), r.getDouble(3))).sortBy(_._1)
      assert(gotSorted.nonEmpty)
      assert(gotSorted === expect.toSeq,
        "streamed route+assign diverged from the batch twin")

      // the landing layout is the router's: batch=<id>/shard_id=<k>/
      val batchDirs = outDir.listFiles().filter(_.getName.startsWith("batch="))
      assert(batchDirs.nonEmpty, "no batch directories landed")
      assert(batchDirs.forall(_.listFiles().exists(_.getName.startsWith("shard_id="))),
        "landed batches are not shard-partitioned")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    }
  }

  test("synthetic embedding expression: deterministic, 64-d, bounded") {
    val s = spark
    import s.implicits._
    val df = s.range(0, 100)
      .select(col("id"),
        StreamAnnIngest.synthEmbedding(lit(7), col("id")).as("e"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(rows.forall(_._2.length == 64))
    assert(rows.forall(_._2.forall(v => v >= -0.5f && v < 0.5f)))
    // deterministic: same (value, seq) → same vector
    val again = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.forall { case (id, e) => again(id) == e })
    // varied: distinct seqs produce distinct vectors
    assert(rows.map(_._2).distinct.length > 90)
  }
}
