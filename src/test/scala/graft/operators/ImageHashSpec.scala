package graft.operators

import graft.SparkSpec

/** dHash behavior pinned on PLANTED fixtures (the oracle gate only proves
  * engine-agreement on the synthetic corpus; these prove the hash finds
  * actual near-duplicates and rejects non-duplicates).
  *
  * Geometry used throughout: a 16×16 source resized to 9×8 samples source
  * xs {0,1,3,5,7,8,10,12,14} (x*16/9) and ys {0,2,4,6,8,10,12,14}
  * (y*16/8) — so a change to a NEVER-SAMPLED pixel is invisible to the
  * hash, and a change to one sampled pixel flips at most the two
  * comparisons it participates in.
  */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def px(i: Int): Int = ((i * 2654435761L) >>> 8).toInt & 0xffffff

  private def raster(f: Int => Int): ImageCodec.Image =
    ImageCodec.Image(16, 16, Array.tabulate(16 * 16)(i => f(i) & 0xffffff))

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash: invisible off-sample edits, tiny on-sample edits, far inversions") {
    val base = ImageHash.dHash(raster(px))
    // (x=2, y=1): x=2 is not in the sampled-x set, y=1 not in sampled-y
    val offSample = ImageHash.dHash(raster(i =>
      if (i == 1 * 16 + 2) 0xffffff else px(i)))
    assert(ham(base, offSample) == 0)
    // (0,0) IS sampled and sits in exactly one comparison (it has no left
    // neighbor), so blowing it out flips at most 1 bit
    val onSample = ImageHash.dHash(raster(i =>
      if (i == 0) 0xffffff else px(i)))
    assert(ham(base, onSample) <= 1)
    // inversion flips every strict gradient sign — nowhere near a dup
    val inverted = ImageHash.dHash(raster(i => ~px(i)))
    assert(ham(base, inverted) > NearDup.HammingThreshold)
  }

  test("planted near-dups surface through the banded path; far images do not") {
    def row(id: Long, img: ImageCodec.Image) =
      Multimodal.ImageRow(id, ImageCodec.encodePng(img), img.width, img.height)
    val ds = Seq(
      row(1L, raster(px)), // base
      row(2L, raster(i => if (i == 1 * 16 + 2) 0 else px(i))), // identical hash
      row(3L, raster(i => if (i == 0) 0xffffff else px(i))),   // hamming ≤ 1
      row(4L, raster(i => ~px(i)))                             // far
    ).toDS()
    val fps = ImageHash.dhashKeys(ds).cache()
    try {
      val stats = NearDup.bandedHammingFrame(fps)
        .select("doc_id", "n_neighbors").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stats(1L) >= 2L, s"base should see docs 2 and 3: $stats")
      assert(stats(2L) >= 1L && stats(3L) >= 1L, stats.toString)
      assert(stats(4L) == 0L, s"inverted image must have no neighbors: $stats")
    } finally fps.unpersist()
  }
}
