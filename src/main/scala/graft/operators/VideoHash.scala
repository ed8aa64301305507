package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._


/** Perceptual video hashing — the fourth and last leg of the near-dup
  * story (text SimHash/MinHash, embedding LSH, image dHash; this adds
  * video). Per decoded frame: the same 9×8 gradient-sign dHash as images
  * (grayscale, so no luma step); per video: each frame hash is rotated by
  * `7 × frame_index mod 64` and the rotations XOR into ONE 64-bit
  * signature. XOR preserves hamming locality for near-duplicates —
  * `popcount(sigA ⊕ sigB) ≤ Σ_f popcount(hashA_f ⊕ hashB_f)` — while the
  * frame-indexed rotation makes the signature ORDER-SENSITIVE (a
  * re-ordered cut is not a near-dup). The signature then rides the exact
  * banded-hamming machinery the other hashes use
  * ([[NearDup.bandedHammingFrame]]).
  *
  * Scale shape: one narrow mapPartitions decodes frames and emits 8 bytes
  * per VIDEO (not per frame, not per pixel); the pair stage shuffles band
  * keys only. Decoding is the real GIF codec — the oracle replays the
  * synthetic corpus's closed-form pixels, so a codec bug on either side
  * breaks the hash.
  */
object VideoHash {

  /** Rotation stride per frame index — coprime to 64, so consecutive
    * frames land on disjoint rotations for up to 64 frames. */
  val FrameRot = 7

  /** dHash of one grayscale raster — delegates to [[ImageHash.dHash]] by
    * packing gray as (g,g,g): the integer luma `(77+150+29)·g >> 8` is
    * exactly g, so the sampling and gradient contracts live in ONE place
    * (a divergence would silently split the image and video oracles). */
  def dHashGray(w: Int, h: Int, gray: Array[Int]): Long =
    ImageHash.dHash(ImageCodec.Image(w, h,
      gray.map(g => (g << 16) | (g << 8) | g)))

  /** One 64-bit signature for a frame-hash sequence: XOR of each hash
    * rotated left by `FrameRot × frame_index mod 64`. */
  def signature(frameHashes: Seq[Long]): Long =
    frameHashes.zipWithIndex.foldLeft(0L) { case (acc, (h, f)) =>
      acc ^ java.lang.Long.rotateLeft(h, (FrameRot * f) % 64)
    }

  /** (doc_id, k0..k3): per-video signatures as four 16-bit band keys —
    * real GIF decode of every frame, narrow mapPartitions, no shuffle. */
  def signatureKeys(videos: Dataset[Multimodal.VideoRow]): DataFrame = {
    import videos.sparkSession.implicits._
    videos.mapPartitions(_.map { v =>
      val hashes = GifCodec.decodeFrames(v.content)
        .map(fr => dHashGray(fr.width, fr.height, fr.gray))
      val s = signature(hashes)
      (v.doc_id, (s & 0xffffL).toInt, ((s >>> 16) & 0xffffL).toInt,
        ((s >>> 32) & 0xffffL).toInt, ((s >>> 48) & 0xffffL).toInt)
    }).toDF("doc_id", "k0", "k1", "k2", "k3")
  }

  /** q_video_neardup — every video with its signature band keys and its
    * symmetric neighbor stats within hamming ≤
    * [[NearDup.HammingThreshold]]; zero-neighbor videos stay in the
    * output (the signatures themselves are the primary gate). */
  def videoNearDup(spark: SparkSession, dir: String): DataFrame = {
    val fps = signatureKeys(Multimodal.videoTable(spark, dir)).cache()
    fps.count()
    NearDup.keepAllNeighborSelect(NearDup.bandedHammingFrame(fps))
  }

  /** Oracle: the synthetic corpus's frame pixel is
    * `(doc_id*31 + f*11 + i*7) % 256` over a `(id%12+4) × (id%8+4)`
    * raster with `id%6+2` frames (Multimodal.videoTable/videoPixel);
    * resize samples `(y*h/8)*w + (x*w/9)`. The rotation-XOR folds per
    * SIGNATURE BIT: bit b = SUM over frames of frame-hash bit
    * `(b − 7f) mod 64`, mod 2 — no 64-bit shift ever materializes (DuckDB
    * BIGINT refuses `1<<63`). The neighbor tail mirrors the image/simhash
    * oracles. */
  val videoNearDupSql: String = {
    val keyAggs = (0 until NearDup.SimhashBands).map(j =>
      s"CAST(SUM(CASE WHEN b // 16 = $j THEN sb * (1 << (b % 16)) ELSE 0 END) AS INTEGER) AS k$j")
      .mkString(",\n    ")
    s"""WITH vid AS (
       |  SELECT doc_id, doc_id % 12 + 4 AS w, doc_id % 8 + 4 AS h
       |  FROM documents),
       |fx AS (
       |  SELECT doc_id, w, h, UNNEST(range(doc_id % 6 + 2)) AS f FROM vid),
       |pix AS (
       |  SELECT doc_id, f, y, x,
       |    ((y * h) // 8) * w + (x * w) // 9 AS i
       |  FROM fx CROSS JOIN range(8) ys(y) CROSS JOIN range(9) xs(x)),
       |lum AS (
       |  SELECT doc_id, f, y, x,
       |    (doc_id * 31 + f * 11 + i * 7) % 256 AS l
       |  FROM pix),
       |bits AS (
       |  SELECT a.doc_id, a.f, a.y * 8 + a.x AS p,
       |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
       |  FROM lum a JOIN lum b
       |    ON b.doc_id = a.doc_id AND b.f = a.f AND b.y = a.y AND b.x = a.x + 1
       |  WHERE a.x < 8),
       |sig AS (
       |  SELECT doc_id, (p + ${VideoHash.FrameRot} * f) % 64 AS b,
       |    SUM(bit) % 2 AS sb
       |  FROM bits GROUP BY doc_id, (p + ${VideoHash.FrameRot} * f) % 64),
       |fp AS (
       |  SELECT doc_id,
       |    $keyAggs
       |  FROM sig GROUP BY doc_id),
       |${NearDup.bandedHammingTailSql}""".stripMargin
  }
}
