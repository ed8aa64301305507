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

  // ---- pointer mode (MediaStore object-store stand-in) ----

  test("pointer-mode features equal payload-mode features on the same corpus") {
    val store = java.nio.file.Files.createTempDirectory("mediastore").toString + "/objs"
    val imgs = Multimodal.imageTable(spark, sf0001).cache()
    val byPayload = Multimodal.imageFeatures(imgs, batchSize = 7)
      .collect().map(f => f.doc_id -> f).toMap
    // upload from executors, then feature-extract via batched fetch+decode
    val ptrs = Multimodal.imagePointers(imgs, store).cache()
    val ptrRows = ptrs.collect()
    assert(ptrRows.length == byPayload.size)
    // keys fan out over prefixes; pointer carries the true object size
    ptrRows.foreach { p =>
      assert(p.uri.contains(s"p=${p.doc_id % 256}/${p.doc_id}.bin"), p.uri)
      assert(new java.io.File(new java.net.URI(p.uri).getPath).length() == p.n_bytes)
    }
    val byPointer = Multimodal.imageFeaturesFromStore(ptrs, batchSize = 7)
      .collect().map(f => f.doc_id -> f).toMap
    assert(byPointer == byPayload)
    ptrs.unpersist(); imgs.unpersist()
  }

  // ---- real video codec (GifCodec, javax.imageio multi-frame GIF) ----

  test("animated GIF round-trips grayscale frames bit-for-bit") {
    val frames = Seq(
      GifCodec.GrayFrame(4, 3, Array(0, 17, 255, 128, 3, 99, 200, 1, 64, 32, 16, 8)),
      GifCodec.GrayFrame(4, 3, Array.tabulate(12)(i => (i * 21) % 256)))
    val gif = GifCodec.encodeFrames(frames)
    assert(GifCodec.isGif(gif))
    val back = GifCodec.decodeFrames(gif)
    assert(back.size == 2)
    back.zip(frames).foreach { case (b, f) =>
      assert(b.width == f.width && b.height == f.height)
      assert(b.gray.sameElements(f.gray), b.gray.toSeq.toString)
    }
    // selective decode returns exactly the requested frames
    val only1 = GifCodec.decodeFramesAt(gif, Seq(1))
    assert(only1.map(_._1) == Seq(1))
    assert(only1.head._2.gray.sameElements(frames(1).gray))
  }

  test("video table payloads are real GIFs; stride sampling decodes the closed form") {
    val vids = Multimodal.videoTable(spark, sf0001).cache()
    vids.collect().take(10).foreach(v => assert(GifCodec.isGif(v.content)))
    val stride = 2
    val feats = Multimodal.videoFrameFeatures(vids, stride, batchSize = 7).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.frame_idx % stride == 0))
    // distributed real decode matches the closed-form raster math
    feats.filter(_.doc_id < 20).foreach { fr =>
      val id = fr.doc_id
      val n = ((id % 12 + 4) * (id % 8 + 4)).toInt
      assert(fr.n_px == n.toLong)
      val px = (0 until n).map(i => Multimodal.videoPixel(id, fr.frame_idx, i))
      assert(fr.mean_gray == px.sum.toDouble / n)
      assert(fr.max_gray == px.max && fr.min_gray == px.min)
    }
    // every video contributes exactly ceil(n_frames / stride) sampled frames
    val perDoc = feats.groupBy(_.doc_id).view.mapValues(_.length).toMap
    vids.collect().foreach { v =>
      assert(perDoc(v.doc_id) == (v.n_frames + stride - 1) / stride)
    }
    vids.unpersist()
  }

  // ---- real image codec (ImageCodec, javax.imageio) ----

  test("PNG and BMP round-trip bit-for-bit (lossless 8-bit RGB)") {
    val img = ImageCodec.Image(3, 2, Array(0xff0000, 0x00ff00, 0x0000ff,
                                           0x123456, 0x000000, 0xffffff))
    val png = ImageCodec.encodePng(img)
    assert(ImageCodec.isPng(png) && !ImageCodec.isBmp(png))
    val backP = ImageCodec.decode(png)
    assert(backP.width == 3 && backP.height == 2)
    assert(backP.rgb.sameElements(img.rgb))
    val bmp = ImageCodec.encodeBmp(img)
    assert(ImageCodec.isBmp(bmp) && !ImageCodec.isPng(bmp))
    assert(ImageCodec.decode(bmp).rgb.sameElements(img.rgb))
  }

  test("features are closed-form on a constant raster") {
    // every pixel 0x402010: means are exact channel values, luma is the
    // integer BT.601 form of that single color
    val img = ImageCodec.Image(5, 4, Array.fill(20)(0x402010))
    val f = ImageCodec.features(img)
    assert(f.n_px == 20 && f.width == 5 && f.height == 4)
    assert(f.mean_r == 64.0 && f.mean_g == 32.0 && f.mean_b == 16.0)
    val luma = (77 * 64 + 150 * 32 + 29 * 16) >> 8
    assert(f.max_luma == luma && f.min_luma == luma)
  }

  test("nearest-neighbor resize: 2x2 checkerboard upscales to exact 2x2 blocks") {
    val img = ImageCodec.Image(2, 2, Array(0xffffff, 0x000000, 0x000000, 0xffffff))
    val up = ImageCodec.resize(img, 4, 4)
    val w = 0xffffff; val k = 0x000000
    assert(up.rgb.toSeq == Seq(
      w, w, k, k,
      w, w, k, k,
      k, k, w, w,
      k, k, w, w))
    // downscale back recovers the original corners
    val down = ImageCodec.resize(up, 2, 2)
    assert(down.rgb.sameElements(img.rgb))
  }

  test("image table payloads are real PNGs; distributed decode matches closed form") {
    val imgs = Multimodal.imageTable(spark, sf0001).cache()
    imgs.collect().take(10).foreach(r => assert(ImageCodec.isPng(r.content)))
    val feats = Multimodal.imageFeatures(imgs, batchSize = 7)
      .collect().map(f => f.doc_id -> f).toMap
    imgs.collect().take(20).foreach { r =>
      val id = r.doc_id
      val n = (id % 16 + 4) * (id % 12 + 4)
      val f = feats(id)
      assert(f.n_px == n)
      val reds = (0L until n).map(i => (id * 31 + i * 7) % 256)
      assert(f.mean_r == reds.sum.toDouble / n)
    }
    val resized = Multimodal.resizeImages(imgs, 8, 6).collect()
    resized.foreach { r =>
      val back = ImageCodec.decode(r.content)
      assert(back.width == 8 && back.height == 6)
    }
    imgs.unpersist()
  }
}
