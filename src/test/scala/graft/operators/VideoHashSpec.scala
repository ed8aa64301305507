package graft.operators

import graft.SparkSpec

/** Video signature behavior pinned on PLANTED fixtures: locality for
  * near-identical frame sequences, order sensitivity for re-cuts, and the
  * banded path finding actual planted near-dups through real GIF
  * round-trips. Frame geometry 16×16 → 9×8 sampling as in ImageHashSpec:
  * source x=2 / y=1 are never sampled. */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  private def px(f: Int)(i: Int): Int =
    (((i + f * 131) * 2654435761L) >>> 9).toInt & 0xff

  private def frame(f: Int, tweak: Map[Int, Int] = Map.empty): GifCodec.GrayFrame =
    GifCodec.GrayFrame(16, 16,
      Array.tabulate(16 * 16)(i => tweak.getOrElse(i, px(f)(i))))

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def sigOf(frames: Seq[GifCodec.GrayFrame]): Long =
    VideoHash.signature(frames.map(fr =>
      VideoHash.dHashGray(fr.width, fr.height, fr.gray)))

  test("signature: locality for tweaks, sensitivity to frame order") {
    val base = Seq(frame(0), frame(1), frame(2))
    val sig = sigOf(base)
    // a never-sampled pixel is invisible
    assert(sigOf(Seq(frame(0, Map(1 * 16 + 2 -> 255)), frame(1), frame(2))) == sig)
    // one sampled pixel in one frame flips at most its two comparisons
    val near = sigOf(Seq(frame(0), frame(1, Map(0 -> 255)), frame(2)))
    assert(ham(sig, near) <= 2, s"got ${ham(sig, near)}")
    // a re-ordered cut is NOT a near-dup: the rotation separates orders
    val swapped = sigOf(Seq(frame(1), frame(0), frame(2)))
    assert(ham(sig, swapped) > NearDup.HammingThreshold,
      s"got ${ham(sig, swapped)}")
    // inverted frames are far
    val inv = sigOf(base.map(fr =>
      GifCodec.GrayFrame(fr.width, fr.height, fr.gray.map(255 - _))))
    assert(ham(sig, inv) > NearDup.HammingThreshold, s"got ${ham(sig, inv)}")
  }

  test("planted near-dup videos surface through the banded path after real GIF round-trips") {
    def row(id: Long, frames: Seq[GifCodec.GrayFrame]) =
      Multimodal.VideoRow(id, GifCodec.encodeFrames(frames), 16, 16, frames.size)
    val ds = Seq(
      row(1L, Seq(frame(0), frame(1), frame(2))),                    // base
      row(2L, Seq(frame(0, Map(1 * 16 + 2 -> 0)), frame(1), frame(2))), // identical sig
      row(3L, Seq(frame(0), frame(1, Map(0 -> 255)), frame(2))),     // hamming ≤ 2
      row(4L, Seq(frame(1), frame(0), frame(2)))                     // re-cut: far
    ).toDS()
    val fps = VideoHash.signatureKeys(ds).cache()
    try {
      val stats = NearDup.bandedHammingFrame(fps)
        .select("doc_id", "n_neighbors").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stats(1L) >= 2L, s"base should see videos 2 and 3: $stats")
      assert(stats(2L) >= 1L && stats(3L) >= 1L, stats.toString)
      assert(stats(4L) == 0L, s"the re-ordered cut must not match: $stats")
    } finally fps.unpersist()
  }
}
