package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages as typed `mapPartitions` transforms.
  *
  * The Spark side — schemas, partition-preserving batch shape, typed
  * encoders, integration with the similarity operators — is real and
  * tested. The codec itself is a STUB (this container has no image/audio
  * libraries): `decodeStub` derives deterministic pixels/metadata from the
  * payload bytes, so every stage is reproducible and assertable. Swapping
  * in a real codec only replaces the function body marked STUB.
  *
  * At scale: per-row narrow transforms, no shuffle anywhere in the media
  * path; `mapPartitions` amortizes (real) codec init per partition, which
  * is the batch shape a Pandas-UDF/native-codec implementation needs.
  */
object Multimodal {

  /** An ingested media object: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String, // image | audio | video
      format: String,     // png | wav | mp4 (fake)
      payload: Array[Byte],
      n_frames: Int)

  /** Decoded image features (stub codec output). */
  final case class DecodedImage(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double)

  /** One sampled video frame. */
  final case class SampledFrame(
      doc_id: Long,
      frame_index: Int,
      frame_bytes: Array[Byte])

  /** Synthesize a deterministic media table from `documents`: payload =
    * md5-chain bytes of the text (native exprs), media type round-robins
    * by doc_id. Stands in for a real binary-file scan
    * (`spark.read.format("binaryFile")`). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        // 32 deterministic bytes: md5(text) ++ md5(md5(text))
        unbase64(base64(concat(unhex(md5(col("text").cast("binary"))),
          unhex(md5(md5(col("text").cast("binary"))))))).as("payload"),
        (pmod(col("doc_id"), lit(24)) + 1).cast("int").as("n_frames"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic metadata/features from payload bytes.
    * A real implementation would call the codec here (per partition, so
    * codec init is amortized — the mapPartitions shape below). */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    require(payload.nonEmpty, "empty media payload")
    val w = 16 + (payload(0) & 0x7f)          // fake width 16..143
    val h = 16 + (payload(1) & 0x7f)          // fake height
    val mean = payload.map(b => (b & 0xff).toDouble).sum / payload.length
    (w, h, 3, mean)
  }

  /** Decode stage: partition-preserving typed transform. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "image").mapPartitions { it =>
      // per-partition codec init would go here (STUB: nothing to init)
      it.map { m =>
        val (w, h, c, mean) = decodeStub(m.payload)
        DecodedImage(m.doc_id, w, h, c, mean)
      }
    }
  }

  /** Resize stage: metadata transform, payload re-derived (STUB). */
  def resize(images: Dataset[DecodedImage], w: Int, h: Int): Dataset[DecodedImage] = {
    import images.sparkSession.implicits._
    images.map(i => i.copy(width = w, height = h))
  }

  /** Frame sampling: one output row per every-nth frame of each video. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      (0 until m.n_frames by everyN).map { f =>
        // STUB frame decode: frame bytes = payload rotated by frame index
        val rot = m.payload.drop(f % m.payload.length) ++ m.payload.take(f % m.payload.length)
        SampledFrame(m.doc_id, f, rot)
      }
    }
  }

  /** Feature extraction: payload → 16-d float embedding (STUB: byte-pair
    * averages), feeding the ANN/similarity operators. */
  def extractFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      val emb = Array.tabulate(16) { i =>
        val a = m.payload((2 * i) % m.payload.length) & 0xff
        val b = m.payload((2 * i + 1) % m.payload.length) & 0xff
        (a + b) / 512.0f
      }
      (m.doc_id, emb)
    }.toDF("doc_id", "embedding")
  }

  /** The payload bytes as a DuckDB int list — the stub codec is pure md5
    * math, so the whole media path is oracle-exact: payload =
    * unhex(md5(text) || md5(md5(text))), one int per hex pair. */
  private val OracleBytes =
    "list_transform(range(32), i -> CAST(('0x' || substr(md5(text) || md5(md5(text)), 2*i+1, 2)) AS INT))"

  /** Gate query: decoded-image stats per format. */
  val qDecodeStats: Q = Q(
    "q_multimodal_decode",
    s"""WITH b AS (
       |  SELECT doc_id, $OracleBytes AS bytes
       |  FROM documents WHERE doc_id % 3 = 0
       |)
       |SELECT count(*) AS images,
       |  round(avg(16 + (bytes[1] % 128)), 4) AS avg_width,
       |  round(avg(16 + (bytes[2] % 128)), 4) AS avg_height,
       |  round(avg(list_sum(bytes) / 32.0), 4) AS avg_intensity
       |FROM b""".stripMargin) { (s, d) =>
    import s.implicits._
    decodeImages(mediaTable(s, d))
      .groupBy()
      .agg(
        count(lit(1)).as("images"),
        round(avg("width"), 4).as("avg_width"),
        round(avg("height"), 4).as("avg_height"),
        round(avg("mean_intensity"), 4).as("avg_intensity"))
  }

  /** Gate query: frame sampling + per-video counts. Closed form: videos
    * are doc_id%3==2, n_frames = doc_id%24+1, frames sampled every 4th. */
  val qFrameSample: Q = Q(
    "q_multimodal_frames",
    """SELECT doc_id,
      |  CAST((doc_id % 24) // 4 + 1 AS BIGINT) AS sampled_frames,
      |  CAST(((doc_id % 24) // 4) * 4 AS INT) AS last_frame
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin) { (s, d) =>
    sampleFrames(mediaTable(s, d), everyN = 4)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("sampled_frames"), max("frame_index").as("last_frame"))
  }

  /** Gate query: media embeddings → nearest media pairs via the same LSH
    * near-dup machinery (integration of modalities). */
  val qMediaFeatures: Q = Q(
    "q_multimodal_features",
    // each float term (a+b)/512.0f is exact (≤9-bit numerator, power-of-2
    // divisor), so the double sum equals total-byte-sum/512 exactly
    s"""SELECT doc_id,
       |  round(list_sum($OracleBytes) / 512.0, 4) AS feature_sum,
       |  CAST(16 AS INT) AS dims
       |FROM documents""".stripMargin) { (s, d) =>
    val feats = extractFeatures(mediaTable(s, d))
    feats.select(
      col("doc_id"),
      round(aggregate(col("embedding"),
        lit(0d), (acc, v) => acc + v.cast("double")), 4).as("feature_sum"),
      size(col("embedding")).as("dims"))
  }

  val all: Seq[Q] = Seq(qDecodeStats, qFrameSample, qMediaFeatures)
}
