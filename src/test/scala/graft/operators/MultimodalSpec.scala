package graft.operators

import graft.SparkSpec

/** The multimodal path with its REAL codecs: images are genuine PNG
  * (JDK ImageIO), audio genuine WAV (RIFF/PCM), video the one declared
  * stub. Every decoded stat must equal the closed-form formula the
  * fixture encoded — the decode is only real if it recovers the exact
  * pixels/samples through the actual container formats. */
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
        case "audio" => assert(new String(m.payload.take(4), "US-ASCII") == "RIFF",
          s"doc ${m.doc_id}: audio payload is not RIFF")
        case _ => assert(m.payload.length == 32,
          s"doc ${m.doc_id}: video stub payload must be the 32 md5-chain bytes")
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

  test("frame sampling: every 4th frame, rotation-deterministic bytes") {
    val frames = Multimodal.sampleFrames(media, everyN = 4).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.foreach { case (_, fs) =>
      assert(fs.map(_.frame_index).sorted.toSeq == fs.map(_.frame_index).min.to(fs.map(_.frame_index).max).by(4))
    }
    assert(frames.forall(_.frame_bytes.length == 32))
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
  }
}
