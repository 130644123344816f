package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages as typed `mapPartitions` transforms.
  *
  * The image and audio codecs are REAL: images are genuine PNG files
  * (encoded with the JDK's own `javax.imageio` — no external libraries),
  * decoded back through `ImageIO.read` with stats computed from actual
  * raster samples; audio is genuine WAV (RIFF container, 8-bit PCM mono)
  * parsed chunk-by-chunk. Both stay oracle-exact because the ENCODED
  * content is a pure closed-form function of doc_id (PNG and PCM are
  * lossless, so decode recovers the formula bit-for-bit) — the DuckDB
  * oracle recomputes the same pixels/samples with list lambdas and never
  * sees a codec byte. Video (mp4) remains the one declared stub: no video
  * codec ships in the JDK and this container has no media libraries, so
  * the mp4 payload is deterministic md5-chain bytes with the real Spark
  * dataflow (schema, partitioning, batch shape) around it.
  *
  * At scale: per-row narrow transforms, no shuffle anywhere in the media
  * path; `mapPartitions` amortizes codec init per partition, which is the
  * batch shape a Pandas-UDF/native-codec implementation needs.
  */
object Multimodal {

  /** An ingested media object: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String, // image | audio | video
      format: String,     // png | wav | mp4 (mp4 payload is the stub)
      payload: Array[Byte],
      n_frames: Int)

  /** Decoded image stats (real `ImageIO` decode). */
  final case class DecodedImage(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double)

  /** Decoded audio stats (real RIFF/WAV parse). */
  final case class DecodedAudio(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_samples: Long,
      mean_amp: Double)

  /** One sampled video frame. */
  final case class SampledFrame(
      doc_id: Long,
      frame_index: Int,
      frame_bytes: Array[Byte])

  // ---- deterministic content formulas (shared with the DuckDB oracle) ----
  // image: w = 16 + doc_id%24, h = 16, gray(x,y) = (doc_id + 7x + 13y) % 256
  // audio: rate 8000 Hz, 8-bit mono, n = 16·(10 + doc_id%7),
  //        sample(t) = (doc_id + 11t) % 256
  private[graft] def imageWidth(k: Long): Int = (16 + k % 24).toInt
  private[graft] val ImageHeight = 16
  private[graft] def grayAt(k: Long, x: Int, y: Int): Int =
    ((k + 7L * x + 13L * y) % 256).toInt
  private[graft] def audioSamples(k: Long): Int = (16L * (10 + k % 7)).toInt
  private[graft] def sampleAt(k: Long, t: Long): Int = ((k + 11L * t) % 256).toInt
  private[graft] val AudioRate = 8000

  /** Real PNG bytes for doc `k`: the deterministic gray gradient encoded
    * with the JDK's ImageIO PNG writer (TYPE_3BYTE_BGR, r=g=b=gray). */
  private[graft] def pngBytes(k: Long): Array[Byte] = {
    val w = imageWidth(k)
    val img = new java.awt.image.BufferedImage(
      w, ImageHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < ImageHeight) {
      var x = 0
      while (x < w) {
        val g = grayAt(k, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real WAV bytes for doc `k`: RIFF header + fmt chunk (PCM, mono,
    * 8 kHz, 8-bit unsigned) + data chunk of the deterministic samples. */
  private[graft] def wavBytes(k: Long): Array[Byte] = {
    val n = audioSamples(k)
    val buf = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                 // PCM
      .putShort(1)                 // mono
      .putInt(AudioRate)           // sample rate
      .putInt(AudioRate)           // byte rate (1 byte/sample)
      .putShort(1)                 // block align
      .putShort(8)                 // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(n)
    var t = 0
    while (t < n) { buf.put(sampleAt(k, t).toByte); t += 1 }
    buf.array()
  }

  /** The mp4 STUB payload: 32 deterministic md5-chain bytes of the text —
    * `unhex(md5(text)) ++ unhex(md5(md5(text)))`, matching the previous
    * all-modality payload so the video oracle formula is unchanged. */
  private[graft] def mp4StubBytes(text: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d1 = md.digest(text.getBytes("UTF-8"))
    val hex1 = d1.map("%02x".format(_)).mkString
    md.reset()
    val d2 = md.digest(hex1.getBytes("UTF-8"))
    d1 ++ d2
  }

  /** Synthesize a deterministic media table from `documents`: media type
    * round-robins by doc_id (0→image, 1→audio, 2→video); image payloads
    * are REAL PNG, audio REAL WAV, video the declared md5-chain stub.
    * Stands in for a real binary-file scan
    * (`spark.read.format("binaryFile")`). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (k, text) =>
          val (mt, fmt, payload) = (k % 3) match {
            case 0 => ("image", "png", pngBytes(k))
            case 1 => ("audio", "wav", wavBytes(k))
            case _ => ("video", "mp4", mp4StubBytes(text))
          }
          MediaRecord(k, mt, fmt, payload, (k % 24 + 1).toInt)
        }
      }
  }

  /** Decode stage: REAL `ImageIO.read` per record inside the
    * partition-preserving batch shape (reader lookup amortizes per
    * partition via the shared ImageIO registry); stats come from actual
    * raster samples, not metadata. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "image").mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.payload))
        require(img != null, s"undecodable image payload for doc ${m.doc_id}")
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        DecodedImage(m.doc_id, w, h, raster.getNumBands,
          sum.toDouble / (w.toLong * h))
      }
    }
  }

  /** Audio decode stage: a real RIFF chunk walk — verify the RIFF/WAVE
    * magic, read the fmt chunk's rate/channels/bits, then fold the data
    * chunk's PCM samples into a mean amplitude. ~30 lines, lib-free. */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "audio").mapPartitions { it =>
      it.map { m =>
        val buf = java.nio.ByteBuffer.wrap(m.payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag(): String = {
          val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
        }
        require(tag() == "RIFF", s"doc ${m.doc_id}: not a RIFF container")
        buf.getInt // riff size
        require(tag() == "WAVE", s"doc ${m.doc_id}: not a WAVE file")
        var rate = 0; var channels = 0; var bits = 0
        var nSamples = 0L; var ampSum = 0L
        while (buf.remaining() >= 8) {
          val id = tag(); val size = buf.getInt
          id match {
            case "fmt " =>
              val fmtEnd = buf.position() + size
              require(buf.getShort == 1, "not PCM")
              channels = buf.getShort
              rate = buf.getInt
              buf.getInt; buf.getShort // byte rate, block align
              bits = buf.getShort
              buf.position(fmtEnd)
            case "data" =>
              require(bits == 8 && channels == 1,
                s"doc ${m.doc_id}: unsupported PCM layout ($bits-bit, $channels ch)")
              nSamples = size
              var i = 0
              while (i < size) { ampSum += buf.get() & 0xff; i += 1 }
            case _ => buf.position(buf.position() + size) // skip unknown chunk
          }
        }
        DecodedAudio(m.doc_id, rate, channels, bits, nSamples,
          if (nSamples == 0) 0.0 else ampSum.toDouble / nSamples)
      }
    }
  }

  /** Resize stage: REAL pixel work — decode, rescale with Graphics2D
    * bilinear interpolation into a w×h raster, report the scaled image's
    * stats. (Re-encoding to PNG would bolt straight on; the stats output
    * keeps the stage assertable.) */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "image").mapPartitions { it =>
      it.map { m =>
        val src = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.payload))
        require(src != null, s"undecodable image payload for doc ${m.doc_id}")
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g2 = dst.createGraphics()
        g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(src, 0, 0, w, h, null)
        g2.dispose()
        val raster = dst.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        DecodedImage(m.doc_id, w, h, raster.getNumBands,
          sum.toDouble / (w.toLong * h))
      }
    }
  }

  /** Nearest-neighbor resize: the ORACLE-EXACT resampling variant —
    * dst(x, y) = src(⌊x·sw/w⌋, ⌊y·sh/h⌋), pure integer index math over
    * the REAL decoded raster, so the output is a closed-form function of
    * the encoded pattern and the gate hash-verifies actual pixel work
    * ([[resize]]'s AWT bilinear stays as the production-quality variant;
    * its kernel weights aren't reproducible in SQL). */
  def resizeNearest(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "image").mapPartitions { it =>
      it.map { m =>
        val src = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.payload))
        require(src != null, s"undecodable image payload for doc ${m.doc_id}")
        val raster = src.getRaster
        val (sw, sh) = (src.getWidth, src.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += raster.getSample(x * sw / w, y * sh / h, 0)
            x += 1
          }
          y += 1
        }
        DecodedImage(m.doc_id, w, h, raster.getNumBands,
          sum.toDouble / (w.toLong * h))
      }
    }
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

  /** Feature extraction: payload → 16-d float embedding feeding the
    * ANN/similarity operators — computed from DECODED content per
    * modality: images → 16 per-row mean intensities of the real PNG
    * raster (h = 16 rows by construction); audio → 16 per-block mean
    * amplitudes of the real PCM data; video (stub) → byte-pair averages
    * of the payload. All dims land in [0, 1). */
  def extractFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val emb = m.media_type match {
          case "image" =>
            val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.payload))
            require(img != null, s"undecodable image payload for doc ${m.doc_id}")
            val raster = img.getRaster
            val w = img.getWidth
            Array.tabulate(16) { y =>
              var sum = 0L
              var x = 0
              while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
              (sum.toDouble / w / 256.0).toFloat
            }
          case "audio" =>
            // data chunk starts at byte 44 in our fixed-layout WAV
            val n = m.payload.length - 44
            val block = n / 16
            Array.tabulate(16) { i =>
              var sum = 0L
              var j = 0
              while (j < block) { sum += m.payload(44 + i * block + j) & 0xff; j += 1 }
              (sum.toDouble / block / 256.0).toFloat
            }
          case _ =>
            Array.tabulate(16) { i =>
              val a = m.payload((2 * i) % m.payload.length) & 0xff
              val b = m.payload((2 * i + 1) % m.payload.length) & 0xff
              (a + b) / 512.0f
            }
        }
        (m.doc_id, emb)
      }
    }.toDF("doc_id", "embedding")
  }

  /** The video stub payload bytes as a DuckDB int list — pure md5 math:
    * payload = unhex(md5(text) || md5(md5(text))), one int per hex pair. */
  private val OracleBytes =
    "list_transform(range(32), i -> CAST(('0x' || substr(md5(text) || md5(md5(text)), 2*i+1, 2)) AS INT))"

  /** The image pixel grid as a DuckDB expression: the same closed-form
    * gray values the PNG encodes (per-row lists, y outer). */
  private def oracleRows(wExpr: String): String =
    s"list_transform(range(16), y -> list_transform(range($wExpr), x -> (doc_id + 7*x + 13*y) % 256))"

  /** Gate query: decoded-image stats per format — REAL decode on the
    * Spark side; the oracle recomputes the encoded formula (PNG is
    * lossless, so raster samples ≡ formula values). */
  val qDecodeStats: Q = Q(
    "q_multimodal_decode",
    s"""WITH px AS (
       |  SELECT doc_id, 16 + doc_id % 24 AS w,
       |    flatten(${oracleRows("16 + doc_id % 24")}) AS pix
       |  FROM documents WHERE doc_id % 3 = 0
       |)
       |SELECT count(*) AS images,
       |  round(avg(w), 4) AS avg_width,
       |  round(avg(CAST(16 AS DOUBLE)), 4) AS avg_height,
       |  round(avg(list_avg(pix)), 4) AS avg_intensity
       |FROM px""".stripMargin) { (s, d) =>
    decodeImages(mediaTable(s, d))
      .groupBy()
      .agg(
        count(lit(1)).as("images"),
        round(avg("width"), 4).as("avg_width"),
        round(avg("height"), 4).as("avg_height"),
        round(avg("mean_intensity"), 4).as("avg_intensity"))
  }

  /** Gate query: decoded-audio stats per clip — REAL RIFF parse on the
    * Spark side; the oracle recomputes the PCM formula (8-bit PCM is the
    * byte value, losslessly). Per-doc rows, so the hash pins every
    * clip's rate, length, and amplitude. */
  val qDecodeAudio: Q = Q(
    "q_multimodal_audio",
    """SELECT doc_id,
      |  CAST(8000 AS INT) AS sample_rate,
      |  CAST(16 * (10 + doc_id % 7) AS BIGINT) AS n_samples,
      |  round(list_avg(list_transform(range(16 * (10 + doc_id % 7)),
      |    t -> (doc_id + 11*t) % 256)), 4) AS mean_amp
      |FROM documents WHERE doc_id % 3 = 1""".stripMargin) { (s, d) =>
    decodeAudio(mediaTable(s, d))
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        round(col("mean_amp"), 4).as("mean_amp"))
  }

  /** Gate query: per-image 8×8 nearest-neighbor thumbnails off the REAL
    * decoded raster — the resize stage made oracle-exact: the sampled
    * source indices are pure integer math (⌊x·sw/8⌋, 2y), so the oracle
    * recomputes each thumbnail's mean from the encoded formula while the
    * Spark side reads actual PNG pixels. Per-doc rows pin every image. */
  val qResizeThumbs: Q = Q(
    "q_multimodal_resize",
    """SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
      |  round(list_avg(flatten(list_transform(range(8), y -> list_transform(range(8),
      |    x -> (doc_id + 7*((x*(16 + doc_id%24))//8) + 13*(2*y)) % 256)))), 4)
      |    AS mean_intensity
      |FROM documents WHERE doc_id % 3 = 0""".stripMargin) { (s, d) =>
    resizeNearest(mediaTable(s, d), 8, 8)
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_intensity"), 4).as("mean_intensity"))
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

  /** Gate query: media embeddings per modality (integration with the
    * similarity surface). The oracle mirrors each modality's decoded
    * content: per-row pixel means (image), per-block sample means
    * (audio), byte pairs (video stub) — float-truncated per dim exactly
    * like the Spark side, summed in ascending dim order on both engines. */
  val qMediaFeatures: Q = Q(
    "q_multimodal_features",
    s"""SELECT doc_id,
       |  round(CASE CAST(doc_id % 3 AS INT)
       |    WHEN 0 THEN list_sum(list_transform(${oracleRows("16 + doc_id % 24")},
       |      r -> CAST(CAST(list_avg(r) / 256.0 AS FLOAT) AS DOUBLE)))
       |    WHEN 1 THEN list_sum(list_transform(range(16),
       |      i -> CAST(CAST(list_avg(list_transform(range(10 + doc_id % 7),
       |             j -> (doc_id + 11*(i*(10 + doc_id % 7) + j)) % 256)) / 256.0
       |           AS FLOAT) AS DOUBLE)))
       |    ELSE list_sum(list_transform(range(16),
       |      i -> CAST(CAST((b.bytes[2*i+1] + b.bytes[2*i+2]) / 512.0 AS FLOAT) AS DOUBLE)))
       |  END, 4) AS feature_sum,
       |  CAST(16 AS INT) AS dims
       |FROM (SELECT doc_id, text, $OracleBytes AS bytes FROM documents) b""".stripMargin) { (s, d) =>
    val feats = extractFeatures(mediaTable(s, d))
    feats.select(
      col("doc_id"),
      round(aggregate(col("embedding"),
        lit(0d), (acc, v) => acc + v.cast("double")), 4).as("feature_sum"),
      size(col("embedding")).as("dims"))
  }

  val all: Seq[Q] =
    Seq(qDecodeStats, qDecodeAudio, qResizeThumbs, qFrameSample, qMediaFeatures)
}
