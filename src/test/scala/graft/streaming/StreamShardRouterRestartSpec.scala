package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The contract added in round 8: `StreamShardRouter.route` with a
  * DURABLE `checkpointLocation` is idempotent ACROSS RESTARTS — batch
  * ids resume from the checkpoint instead of renumbering from 0, so a
  * restarted query writes only the not-yet-committed data and never
  * double-counts what an earlier run already landed (the at-least-once →
  * exactly-once-equivalent upgrade the scaladoc documents; without a
  * checkpoint, callers must clear outDir per fresh run, as
  * q_stream_shard_route does). */
class StreamShardRouterRestartSpec extends SparkSpec {

  test("restart with the same checkpoint resumes batch ids and never double-counts") {
    val base = Files.createTempDirectory("graft_shard_ckpt").toFile.getAbsolutePath
    val srcDir = s"$base/src"
    val outDir = s"$base/out"
    val ckpt = s"$base/ckpt"
    new java.io.File(srcDir).mkdirs()
    try {
      import spark.implicits._
      def docs(from: Int, until: Int) =
        (from until until).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      def runOnce(): Unit = {
        val src = spark.readStream
          .schema("doc_id LONG, text STRING")
          .parquet(srcDir)
        StreamShardRouter.route(src, outDir, numShards = 4,
          checkpointLocation = Some(ckpt)).awaitTermination()
      }

      docs(0, 10).write.mode("append").parquet(srcDir)
      runOnce() // run 1: lands docs 0..9 as batch 0

      runOnce() // run 2, no new data: must not re-land batch 0 as a new batch

      docs(10, 20).write.mode("append").parquet(srcDir)
      runOnce() // run 3: lands ONLY docs 10..19, under a NEW batch id

      val landed = spark.read.parquet(outDir)
      assert(landed.count() === 20,
        s"restart double-counted: ${landed.count()} rows for 20 distinct docs")
      assert(landed.select("doc_id").distinct().count() === 20)

      // batch ids resumed (0 then >0), not renumbered to collide
      val batchDirs = new java.io.File(outDir).listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
      assert(batchDirs.length === 2, s"expected 2 landed batches, got ${batchDirs.mkString(", ")}")
      assert(batchDirs.head === "batch=0" && batchDirs.last != "batch=0")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }
}
