package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages as typed `mapPartitions` transforms.
  *
  * ALL THREE codecs are REAL: images are genuine PNG files (encoded
  * with the JDK's own `javax.imageio` — no external libraries), decoded
  * back through `ImageIO.read` with stats computed from actual raster
  * samples; audio is genuine WAV (RIFF container, 8-bit PCM mono)
  * parsed chunk-by-chunk; video is genuine AVI (RIFF container, LIST
  * hdrl/strl/movi tree, uncompressed 24-bit DIB frames, idx1 index)
  * parsed by the generalized RIFF walker with per-frame pixel decode.
  * All stay oracle-exact because the ENCODED content is a pure
  * closed-form function of doc_id (PNG, PCM and uncompressed DIB are
  * lossless, so decode recovers the formula bit-for-bit) — the DuckDB
  * oracle recomputes the same pixels/samples/frames with list lambdas
  * and never sees a codec byte.
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
      format: String,     // png | wav | avi (all real containers)
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

  /** Decoded video stats (real RIFF/AVI parse, uncompressed DIB). */
  final case class DecodedVideo(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      fps: Double,
      mean_intensity: Double)

  /** One sampled video frame. */
  final case class SampledFrame(
      doc_id: Long,
      frame_index: Int,
      frame_bytes: Array[Byte])

  // ---- deterministic content formulas (shared with the DuckDB oracle) ----
  // image: w = 16 + doc_id%24, h = 16, gray(x,y) = (doc_id + 7x + 13y) % 256
  // audio: rate 8000 Hz, 8-bit mono, n = 16·(10 + doc_id%7),
  //        sample(t) = (doc_id + 11t) % 256
  // video: nf = doc_id%24 + 1 frames of the image grid shifted 31 per
  //        frame: pix(f,x,y) = (doc_id + 7x + 13y + 31f) % 256, 8 fps
  private[graft] def imageWidth(k: Long): Int = (16 + k % 24).toInt
  private[graft] val ImageHeight = 16
  private[graft] def grayAt(k: Long, x: Int, y: Int): Int =
    ((k + 7L * x + 13L * y) % 256).toInt
  private[graft] def audioSamples(k: Long): Int = (16L * (10 + k % 7)).toInt
  private[graft] def sampleAt(k: Long, t: Long): Int = ((k + 11L * t) % 256).toInt
  private[graft] val AudioRate = 8000
  private[graft] def videoFrames(k: Long): Int = (k % 24 + 1).toInt
  private[graft] def videoPixAt(k: Long, f: Int, x: Int, y: Int): Int =
    ((k + 7L * x + 13L * y + 31L * f) % 256).toInt
  private[graft] val VideoFps = 8

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

  /** One video frame's raw DIB bits for doc `k`: BGR24, BOTTOM-UP row
    * order (positive biHeight — the Windows-bitmap default), each row
    * padded to a 4-byte boundary. r=g=b=pix, so the bits are the
    * closed-form formula verbatim. */
  private[graft] def dibFrameBytes(k: Long, f: Int): Array[Byte] = {
    val w = imageWidth(k)
    val stride = (3 * w + 3) & ~3
    val out = new Array[Byte](stride * ImageHeight)
    var y = 0
    while (y < ImageHeight) {
      val rowOff = (ImageHeight - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val g = videoPixAt(k, f, x, y).toByte
        out(rowOff + 3 * x) = g; out(rowOff + 3 * x + 1) = g
        out(rowOff + 3 * x + 2) = g
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real AVI bytes for doc `k`: RIFF 'AVI ' container — LIST hdrl
    * (avih MainAVIHeader + LIST strl (strh 'vids'/'DIB ' stream header +
    * strf BITMAPINFOHEADER, BI_RGB 24-bit)) + LIST movi of one '00db'
    * uncompressed-DIB chunk per frame + idx1 index. Uncompressed DIB is
    * lossless, so decode recovers [[videoPixAt]] bit-for-bit and the
    * DuckDB oracle recomputes the formula without seeing a codec byte.
    * (A production ingest would read mp4/h264; that codec needs
    * libraries this container lacks and isn't reproducible closed-form,
    * so graft ships the JDK-only lossless container with the identical
    * dataflow shape — binary payload, per-partition decode, no shuffle.) */
  private[graft] def aviBytes(k: Long): Array[Byte] = {
    val w = imageWidth(k); val h = ImageHeight
    val nf = videoFrames(k)
    val stride = (3 * w + 3) & ~3
    val frameSize = stride * h                  // multiple of 4: no chunk pad
    val strlSize = 4 + (8 + 56) + (8 + 40)      // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nf * (8 + frameSize)
    val idx1Size = 16 * nf
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / VideoFps)              // dwMicroSecPerFrame
      .putInt(frameSize * VideoFps)             // dwMaxBytesPerSec
      .putInt(0)                                // dwPaddingGranularity
      .putInt(0x10)                             // dwFlags: AVIF_HASINDEX
      .putInt(nf)                               // dwTotalFrames
      .putInt(0)                                // dwInitialFrames
      .putInt(1)                                // dwStreams
      .putInt(frameSize)                        // dwSuggestedBufferSize
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)  // dwReserved[4]
    fourcc("LIST"); buf.putInt(strlSize); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0)                               // dwFlags
      .putShort(0).putShort(0)                  // wPriority, wLanguage
      .putInt(0)                                // dwInitialFrames
      .putInt(1)                                // dwScale
      .putInt(VideoFps)                         // dwRate (rate/scale = fps)
      .putInt(0)                                // dwStart
      .putInt(nf)                               // dwLength (frames)
      .putInt(frameSize)                        // dwSuggestedBufferSize
      .putInt(-1)                               // dwQuality (default)
      .putInt(0)                                // dwSampleSize (0: video)
      .putShort(0).putShort(0)                  // rcFrame left, top
      .putShort(w.toShort).putShort(h.toShort)  // rcFrame right, bottom
    fourcc("strf"); buf.putInt(40)              // BITMAPINFOHEADER
    buf.putInt(40)                              // biSize
      .putInt(w).putInt(h)                      // biHeight > 0: bottom-up
      .putShort(1)                              // biPlanes
      .putShort(24)                             // biBitCount
      .putInt(0)                                // biCompression = BI_RGB
      .putInt(frameSize)                        // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0)  // ppm, colors
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < nf) {
      fourcc("00db"); buf.putInt(frameSize); buf.put(dibFrameBytes(k, f))
      f += 1
    }
    fourcc("idx1"); buf.putInt(idx1Size)
    var off = 4                                 // offsets relative to 'movi'
    f = 0
    while (f < nf) {
      fourcc("00db")
      buf.putInt(0x10)                          // AVIIF_KEYFRAME
        .putInt(off).putInt(frameSize)
      off += 8 + frameSize
      f += 1
    }
    buf.array()
  }

  /** Synthesize a deterministic media table from `documents`: media type
    * round-robins by doc_id (0→image, 1→audio, 2→video); image payloads
    * are REAL PNG, audio REAL WAV, video REAL AVI (uncompressed DIB
    * frames). Stands in for a real binary-file scan
    * (`spark.read.format("binaryFile")`). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { k =>
          val (mt, fmt, payload) = (k % 3) match {
            case 0 => ("image", "png", pngBytes(k))
            case 1 => ("audio", "wav", wavBytes(k))
            case _ => ("video", "avi", aviBytes(k))
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
        // RIFF chunks are word-aligned: an odd-sized chunk is followed
        // by one pad byte that is NOT counted in its size field
        def skipPad(size: Int): Unit =
          if ((size & 1) == 1 && buf.remaining() > 0) buf.get()
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
          skipPad(size)
        }
        DecodedAudio(m.doc_id, rate, channels, bits, nSamples,
          if (nSamples == 0) 0.0 else ampSum.toDouble / nSamples)
      }
    }
  }

  /** A parsed AVI: stream geometry + the raw DIB bits of every frame. */
  private[graft] final case class AviFile(
      width: Int, height: Int, nFrames: Int, fps: Double,
      frames: IndexedSeq[Array[Byte]])

  /** Real AVI parse: walks the RIFF tree (hdrl/strl/movi LISTs
    * descended, unknown chunks skipped with word-alignment pads),
    * reads avih geometry, strh rate/scale, validates strf is BI_RGB
    * 24-bit, and collects each '00db' chunk's DIB bits. The generalized
    * form of [[decodeAudio]]'s flat WAV walk. */
  private[graft] def parseAvi(docId: Long, payload: Array[Byte]): AviFile = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", s"doc $docId: not a RIFF container")
    buf.getInt // riff size
    require(tag() == "AVI ", s"doc $docId: not an AVI file")
    var w = 0; var h = 0; var nf = 0; var fps = 0.0
    val frames = scala.collection.immutable.ArraySeq.newBuilder[Array[Byte]]
    // the ONE word-alignment rule, applied after EVERY consumed chunk
    // (same contract as decodeAudio's skipPad): odd-size chunks carry a
    // pad byte not counted in their size field
    def skipPad(size: Int): Unit =
      if ((size & 1) == 1 && buf.remaining() > 0) buf.get()
    // LIST bodies are chunk sequences like the top level, so a LIST we
    // care about is "entered" by simply continuing the walk at its body
    while (buf.remaining() >= 8) {
      val id = tag(); val size = buf.getInt
      id match {
        case "LIST" =>
          val listType = tag()
          if (!Set("hdrl", "strl", "movi").contains(listType)) {
            buf.position(buf.position() + size - 4)
            skipPad(size)
          }
          // entered lists consume no body here — children pad themselves
        case "00db" | "00dc" =>
          val bytes = new Array[Byte](size)
          buf.get(bytes)
          frames += bytes
          skipPad(size)
        case other =>
          val end = buf.position() + size
          other match {
            case "avih" =>
              buf.getInt                       // dwMicroSecPerFrame
              buf.getInt; buf.getInt; buf.getInt // maxBytesPerSec, padding, flags
              nf = buf.getInt                  // dwTotalFrames
              buf.getInt; buf.getInt; buf.getInt // initialFrames, streams, bufSize
              w = buf.getInt; h = buf.getInt
            case "strh" =>
              require(tag() == "vids", s"doc $docId: first stream is not video")
              tag()                            // handler ('DIB ')
              buf.getInt; buf.getInt; buf.getInt // flags, prio/lang, initialFrames
              val scale = buf.getInt; val rate = buf.getInt
              require(scale > 0, s"doc $docId: zero strh scale")
              fps = rate.toDouble / scale
            case "strf" =>
              buf.getInt                       // biSize
              buf.getInt; buf.getInt           // biWidth, biHeight
              buf.getShort                     // biPlanes
              val bits = buf.getShort
              val compression = buf.getInt
              require(bits == 24 && compression == 0,
                s"doc $docId: unsupported DIB layout ($bits-bit, compression $compression)")
            case _ => ()                       // unknown chunk: skip body
          }
          buf.position(end)
          skipPad(size)
      }
    }
    val fs = frames.result()
    require(fs.length == nf,
      s"doc $docId: avih declares $nf frames, movi carries ${fs.length}")
    AviFile(w, h, nf, fps, fs)
  }

  /** Gray value at IMAGE coordinates (x, y) of a bottom-up BGR24 DIB
    * frame (rows stored last-to-first, stride padded to 4 bytes). All
    * three channels are read — r=g=b in the fixture, but the decode
    * touches every byte like a real one would. */
  private def dibGray3(frame: Array[Byte], stride: Int, h: Int, x: Int, y: Int): Int = {
    val off = (h - 1 - y) * stride + 3 * x
    (frame(off) & 0xff) + (frame(off + 1) & 0xff) + (frame(off + 2) & 0xff)
  }

  /** Decode stage for video: REAL AVI parse per record, stats from the
    * actual DIB pixels of every frame (all channels), not metadata. */
  def decodeVideo(media: Dataset[MediaRecord]): Dataset[DecodedVideo] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").mapPartitions { it =>
      it.map { m =>
        val avi = parseAvi(m.doc_id, m.payload)
        val stride = (3 * avi.width + 3) & ~3
        var sum = 0L
        avi.frames.foreach { fr =>
          var y = 0
          while (y < avi.height) {
            var x = 0
            while (x < avi.width) {
              sum += dibGray3(fr, stride, avi.height, x, y)
              x += 1
            }
            y += 1
          }
        }
        val px = 3L * avi.nFrames * avi.width * avi.height
        DecodedVideo(m.doc_id, avi.width, avi.height, avi.nFrames, avi.fps,
          if (px == 0) 0.0 else sum.toDouble / px)
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

  /** Frame sampling: one output row per every-nth frame of each video —
    * REAL extraction: the frame bytes are the '00db' chunk's actual DIB
    * bits pulled from the parsed AVI, not a placeholder. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      val avi = parseAvi(m.doc_id, m.payload)
      (0 until avi.nFrames by everyN).map { f =>
        SampledFrame(m.doc_id, f, avi.frames(f))
      }
    }
  }

  /** Feature extraction: payload → 16-d float embedding feeding the
    * ANN/similarity operators — computed from DECODED content per
    * modality: images → 16 per-row mean intensities of the real PNG
    * raster (h = 16 rows by construction); audio → 16 per-block mean
    * amplitudes of the real PCM data; video → 16 per-row mean
    * intensities of the DECODED first AVI frame (same geometry as the
    * image branch). All dims land in [0, 1). */
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
            val avi = parseAvi(m.doc_id, m.payload)
            val f0 = avi.frames.head
            val stride = (3 * avi.width + 3) & ~3
            Array.tabulate(16) { y =>
              var sum = 0L
              var x = 0
              while (x < avi.width) {
                // single channel, like the image branch's getSample(_, _, 0)
                sum += f0((avi.height - 1 - y) * stride + 3 * x) & 0xff
                x += 1
              }
              (sum.toDouble / avi.width / 256.0).toFloat
            }
        }
        (m.doc_id, emb)
      }
    }.toDF("doc_id", "embedding")
  }

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
    * (audio), frame-0 per-row pixel means (video — [[videoPixAt]] at
    * f=0 IS the image formula, so the branch expression is shared) —
    * float-truncated per dim exactly like the Spark side, summed in
    * ascending dim order on both engines. */
  val qMediaFeatures: Q = Q(
    "q_multimodal_features",
    s"""SELECT doc_id,
       |  round(CASE CAST(doc_id % 3 AS INT)
       |    WHEN 1 THEN list_sum(list_transform(range(16),
       |      i -> CAST(CAST(list_avg(list_transform(range(10 + doc_id % 7),
       |             j -> (doc_id + 11*(i*(10 + doc_id % 7) + j)) % 256)) / 256.0
       |           AS FLOAT) AS DOUBLE)))
       |    ELSE list_sum(list_transform(${oracleRows("16 + doc_id % 24")},
       |      r -> CAST(CAST(list_avg(r) / 256.0 AS FLOAT) AS DOUBLE)))
       |  END, 4) AS feature_sum,
       |  CAST(16 AS INT) AS dims
       |FROM documents""".stripMargin) { (s, d) =>
    val feats = extractFeatures(mediaTable(s, d))
    feats.select(
      col("doc_id"),
      round(aggregate(col("embedding"),
        lit(0d), (acc, v) => acc + v.cast("double")), 4).as("feature_sum"),
      size(col("embedding")).as("dims"))
  }

  /** Gate query: per-video decoded stats — REAL AVI/DIB decode on the
    * Spark side (geometry from avih, fps from strh rate/scale, mean
    * intensity from every frame's actual pixel bytes); the oracle
    * recomputes the encoded formula (uncompressed DIB is lossless).
    * Per-doc rows, so the hash pins every video's geometry, frame
    * count, fps and full-pixel mean. */
  val qDecodeVideo: Q = Q(
    "q_multimodal_video",
    """SELECT doc_id,
      |  CAST(16 + doc_id % 24 AS INT) AS width,
      |  CAST(16 AS INT) AS height,
      |  CAST(doc_id % 24 + 1 AS INT) AS n_frames,
      |  CAST(8 AS DOUBLE) AS fps,
      |  round(list_avg(flatten(list_transform(range(doc_id % 24 + 1),
      |    f -> flatten(list_transform(range(16),
      |      y -> list_transform(range(16 + doc_id % 24),
      |        x -> (doc_id + 7*x + 13*y + 31*f) % 256)))))), 4) AS mean_intensity
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin) { (s, d) =>
    decodeVideo(mediaTable(s, d))
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        col("fps"), round(col("mean_intensity"), 4).as("mean_intensity"))
  }

  val all: Seq[Q] =
    Seq(qDecodeStats, qDecodeAudio, qDecodeVideo, qResizeThumbs, qFrameSample,
      qMediaFeatures)
}
