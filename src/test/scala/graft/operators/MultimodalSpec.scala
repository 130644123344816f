package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sf)

  test("media table: deterministic payloads, one type per doc") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.payload.length == 32))
    assert(rows.map(_.media_type).toSet == Set("image", "audio", "video"))
    // determinism: rebuilding yields identical payloads
    val again = Multimodal.mediaTable(spark, sf).collect()
      .map(m => m.doc_id -> m.payload.toSeq).toMap
    assert(rows.forall(m => again(m.doc_id) == m.payload.toSeq))
  }

  test("decode stage: partition-preserving, plausible stub features") {
    val imgs = Multimodal.decodeImages(media)
    assert(imgs.rdd.getNumPartitions == media.rdd.getNumPartitions)
    val rows = imgs.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(i => i.width >= 16 && i.width <= 143))
    assert(rows.forall(i => i.mean_intensity >= 0 && i.mean_intensity <= 255))
    val resized = Multimodal.resize(imgs, 224, 224).collect()
    assert(resized.forall(i => i.width == 224 && i.height == 224))
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

  test("feature extraction feeds the similarity surface") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema.fieldNames.toSeq == Seq("doc_id", "embedding"))
    val first = feats.head
    val emb = first.getSeq[Float](1)
    assert(emb.length == 16)
    assert(emb.forall(v => v >= 0f && v <= 1f))
  }
}
