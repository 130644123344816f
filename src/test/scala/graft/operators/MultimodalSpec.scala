package graft.operators

import graft.SparkSpec

/** The multimodal path with its REAL codecs: images are genuine PNG
  * (JDK ImageIO), audio genuine WAV (RIFF/PCM), video genuine AVI
  * (RIFF tree, uncompressed DIB frames). Every decoded stat must equal
  * the closed-form formula the fixture encoded — the decode is only
  * real if it recovers the exact pixels/samples/frames through the
  * actual container formats. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sf)

  test("media table: real containers per modality, deterministic payloads") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.media_type).toSet == Set("image", "audio", "video"))
    val pngMagic = Array(0x89, 'P', 'N', 'G').map(_.toByte)
    rows.foreach { m =>
      m.media_type match {
        case "image" => assert(m.payload.take(4).sameElements(pngMagic),
          s"doc ${m.doc_id}: image payload is not PNG")
        case "audio" => assert(new String(m.payload.take(4), "US-ASCII") == "RIFF" &&
          new String(m.payload.slice(8, 12), "US-ASCII") == "WAVE",
          s"doc ${m.doc_id}: audio payload is not RIFF/WAVE")
        case _ => assert(new String(m.payload.take(4), "US-ASCII") == "RIFF" &&
          new String(m.payload.slice(8, 12), "US-ASCII") == "AVI ",
          s"doc ${m.doc_id}: video payload is not RIFF/AVI")
      }
    }
    // determinism: rebuilding yields identical payloads (PNG/WAV encode
    // included — the encoders are deterministic for identical rasters)
    val again = Multimodal.mediaTable(spark, sf).collect()
      .map(m => m.doc_id -> m.payload.toSeq).toMap
    assert(rows.forall(m => again(m.doc_id) == m.payload.toSeq))
  }

  test("image decode: real ImageIO round-trip recovers the encoded formula exactly") {
    val imgs = Multimodal.decodeImages(media)
    assert(imgs.rdd.getNumPartitions == media.rdd.getNumPartitions)
    val rows = imgs.collect()
    assert(rows.nonEmpty)
    rows.foreach { i =>
      val k = i.doc_id
      assert(i.width == Multimodal.imageWidth(k) && i.height == 16 && i.channels == 3)
      val expect = (for (y <- 0 until 16; x <- 0 until i.width)
        yield Multimodal.grayAt(k, x, y)).sum.toDouble / (i.width * 16)
      assert(i.mean_intensity == expect,
        s"doc $k: decoded mean ${i.mean_intensity} != encoded-formula mean $expect")
    }
  }

  test("audio decode: real RIFF walk recovers rate, length and PCM mean exactly") {
    val rows = Multimodal.decodeAudio(media).collect()
    assert(rows.nonEmpty)
    rows.foreach { a =>
      val k = a.doc_id
      val n = Multimodal.audioSamples(k)
      assert(a.sample_rate == 8000 && a.channels == 1 && a.bits == 8)
      assert(a.n_samples == n)
      val expect = (0 until n).map(t => Multimodal.sampleAt(k, t)).sum.toDouble / n
      assert(a.mean_amp == expect,
        s"doc $k: decoded amp ${a.mean_amp} != encoded-formula mean $expect")
    }
  }

  test("nearest-neighbor resize recovers the closed-form thumbnail exactly") {
    val rows = Multimodal.resizeNearest(media, 8, 8).collect()
    assert(rows.nonEmpty)
    rows.foreach { i =>
      val k = i.doc_id
      val sw = Multimodal.imageWidth(k)
      val expect = (for (y <- 0 until 8; x <- 0 until 8)
        yield Multimodal.grayAt(k, x * sw / 8, y * 16 / 8)).sum.toDouble / 64
      assert(i.width == 8 && i.height == 8)
      assert(i.mean_intensity == expect,
        s"doc $k: thumbnail mean ${i.mean_intensity} != formula $expect")
    }
  }

  test("resize: real bilinear rescale to the target raster") {
    val resized = Multimodal.resize(media, 224, 224).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(i => i.width == 224 && i.height == 224 && i.channels == 3))
    // interpolated means stay inside the source intensity range
    assert(resized.forall(i => i.mean_intensity >= 0 && i.mean_intensity <= 255))
  }

  test("video decode: real AVI/DIB parse recovers geometry, fps and pixels exactly") {
    val rows = Multimodal.decodeVideo(media).collect()
    assert(rows.nonEmpty)
    rows.foreach { v =>
      val k = v.doc_id
      val w = Multimodal.imageWidth(k)
      val nf = Multimodal.videoFrames(k)
      assert(v.width == w && v.height == 16 && v.n_frames == nf && v.fps == 8.0)
      val expect = (for (f <- 0 until nf; y <- 0 until 16; x <- 0 until w)
        yield Multimodal.videoPixAt(k, f, x, y)).sum.toDouble / (nf.toLong * w * 16)
      assert(v.mean_intensity == expect,
        s"doc $k: decoded mean ${v.mean_intensity} != encoded-formula mean $expect")
    }
  }

  test("frame sampling: every 4th frame, REAL DIB bits from the parsed AVI") {
    val frames = Multimodal.sampleFrames(media, everyN = 4).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.foreach { case (_, fs) =>
      assert(fs.map(_.frame_index).sorted.toSeq == fs.map(_.frame_index).min.to(fs.map(_.frame_index).max).by(4))
    }
    // the sampled bytes must BE the frame's DIB bits: bottom-up BGR24,
    // stride padded to 4 — byte-compare against the closed-form encoding
    frames.foreach { fr =>
      val expect = Multimodal.dibFrameBytes(fr.doc_id, fr.frame_index)
      assert(fr.frame_bytes.sameElements(expect),
        s"doc ${fr.doc_id} frame ${fr.frame_index}: sampled bytes are not the encoded DIB bits")
    }
  }

  test("RIFF walkers skip the word-alignment pad after odd-sized chunks") {
    // hand-build a WAV with an odd-sized unknown chunk (plus pad byte)
    // BEFORE fmt/data: a walker that forgets the pad misreads every
    // later tag by one byte. Chunk sizes in our generated media are all
    // even, so this is the external-file robustness case.
    val k = 1L
    val base = Multimodal.wavBytes(k)
    val junk = Array[Byte]('j', 'u', 'n', 'k', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val buf = java.nio.ByteBuffer.allocate(base.length + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(base, 0, 12)                  // RIFF <size> WAVE
    buf.put(junk)                         // odd chunk + its pad byte
    buf.put(base, 12, base.length - 12)   // fmt + data as before
    buf.putInt(4, base.length - 8 + junk.length) // patch riff size
    val padded = buf.array()
    import spark.implicits._
    val one = Seq(Multimodal.MediaRecord(k, "audio", "wav", padded, 1)).toDS()
    val a = Multimodal.decodeAudio(one).collect().head
    assert(a.sample_rate == 8000 && a.n_samples == Multimodal.audioSamples(k))

    // same robustness on the AVI walker: an odd-sized junk chunk (plus
    // its pad byte) injected before the hdrl LIST must not desync the
    // tree walk — every branch pads, not just the unknown-chunk skip
    val kv = 2L
    val avi = Multimodal.aviBytes(kv)
    val buf2 = java.nio.ByteBuffer.allocate(avi.length + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf2.put(avi, 0, 12)                  // RIFF <size> 'AVI '
    buf2.put(junk)
    buf2.put(avi, 12, avi.length - 12)
    buf2.putInt(4, avi.length - 8 + junk.length)
    val parsed = Multimodal.parseAvi(kv, buf2.array())
    assert(parsed.width == Multimodal.imageWidth(kv) &&
      parsed.nFrames == Multimodal.videoFrames(kv) && parsed.fps == 8.0)
    assert(parsed.frames.head.sameElements(Multimodal.dibFrameBytes(kv, 0)))
  }

  test("feature extraction feeds the similarity surface, per modality") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema.fieldNames.toSeq == Seq("doc_id", "embedding"))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      assert(emb.length == 16)
      assert(emb.forall(v => v >= 0f && v < 1f))
    }
    // image dims are the decoded per-row means — check one doc exactly
    val k = rows.map(_.getLong(0)).filter(_ % 3 == 0).min
    val emb = rows.find(_.getLong(0) == k).get.getSeq[Float](1)
    val w = Multimodal.imageWidth(k)
    val expect = (0 until 16).map { y =>
      ((0 until w).map(x => Multimodal.grayAt(k, x, y)).sum.toDouble / w / 256.0).toFloat
    }
    assert(emb == expect, s"doc $k: feature dims diverge from decoded rows")
    // video dims are frame-0 per-row means of the REAL decoded AVI —
    // videoPixAt(f=0) is the image formula, at the video doc's width
    val kv = rows.map(_.getLong(0)).filter(_ % 3 == 2).min
    val embV = rows.find(_.getLong(0) == kv).get.getSeq[Float](1)
    val wv = Multimodal.imageWidth(kv)
    val expectV = (0 until 16).map { y =>
      ((0 until wv).map(x => Multimodal.videoPixAt(kv, 0, x, y)).sum.toDouble / wv / 256.0).toFloat
    }
    assert(embV == expectV, s"doc $kv: video feature dims diverge from decoded frame 0")
  }
}
