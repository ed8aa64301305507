package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sf0001).cache()

  test("media table: binary payload + typed metadata, deterministic types") {
    val r = media.head()
    assert(Seq("image", "audio", "video").contains(r.media_type))
    assert(r.content.nonEmpty && r.width > 0 && r.height > 0)
    val types = media.collect().map(m => m.doc_id -> m.media_type)
    types.foreach { case (id, t) =>
      assert(t == Seq("image", "audio", "video")((id % 3).toInt))
    }
  }

  test("batched feature extraction matches a driver-side recompute") {
    val feats = Multimodal.extractFeatures(media, batchSize = 7)
      .collect().map(f => f.doc_id -> f).toMap
    media.collect().take(20).foreach { m =>
      val bytes = m.content.map(_ & 0xff)
      val f = feats(m.doc_id)
      assert(f.n_bytes == bytes.length.toLong)
      assert(f.mean_byte == bytes.sum.toDouble / bytes.length)
      assert(f.max_byte == bytes.max && f.min_byte == bytes.min)
    }
  }

  test("resize produces exactly targetW*targetH bytes drawn from the source") {
    val resized = Multimodal.resizeStub(media, 8, 6).collect()
    resized.foreach { m =>
      assert(m.content.length == 48 && m.width == 8 && m.height == 6)
    }
  }

  test("frame sampling keeps every stride-th frame of video rows only") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    val videoIds = media.filter(_.media_type == "video").collect().map(_.doc_id).toSet
    assert(frames.map(_.doc_id).toSet.subsetOf(videoIds))
  }
}
