package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Additive schema evolution on the landed corpus — the table-format
  * rule: new ingest columns may appear mid-stream; old rows read them as
  * null. The DEFAULT read stays strict (a silently missing column is
  * usually an ingest bug); evolution is an explicit opt-in on both the
  * read and the fold. */
class SchemaEvolutionSpec extends SparkSpec {

  test("strict read refuses an evolved tree; opt-in reads and folds the superset") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_evo").toFile.getAbsolutePath + "/t"
    try {
      StreamShardRouter.landBatch(
        Seq((1L, 10.0), (2L, 20.0)).toDF("doc_id", "v"), dir, 0L)
      // the crawler starts emitting a language tag mid-stream
      StreamShardRouter.landBatch(
        Seq((3L, 30.0, "en")).toDF("doc_id", "v", "lang"), dir, 1L)

      intercept[Exception] { DeltaCompact.readCorpus(s, dir).collect() }

      val evolved = DeltaCompact.readCorpus(s, dir, allowEvolution = true)
      assert(evolved.columns.contains("lang"))
      assert(evolved.filter(col("lang").isNull).count() === 2,
        "pre-evolution rows read the new column as null")
      assert(evolved.filter(col("lang") === "en").count() === 1)

      // the fold carries the superset schema forward; post-fold reads
      // need no opt-in (one homogeneous base again)
      DeltaCompact.compact(s, dir, allowEvolution = true)
      val folded = DeltaCompact.readCorpus(s, dir)
      assert(folded.columns.contains("lang") && folded.count() === 3)
      assert(folded.filter(col("lang").isNull).count() === 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dir).getParentFile)
    }
  }
}
