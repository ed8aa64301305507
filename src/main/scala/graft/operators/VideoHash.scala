package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** dHash of one grayscale raster: nearest-neighbor resize to 9×8 (the
    * exact ImageCodec.resize sampling: source index
    * `(y*h/8)*w + (x*w/9)`), bit `y*8+x` set iff the right sample is
    * strictly brighter than the left. */
  def dHashGray(w: Int, h: Int, gray: Array[Int]): Long = {
    val s = new Array[Int](ImageHash.DHashW * ImageHash.DHashH)
    var y = 0
    while (y < ImageHash.DHashH) {
      val sy = y * h / ImageHash.DHashH
      var x = 0
      while (x < ImageHash.DHashW) {
        s(y * ImageHash.DHashW + x) = gray(sy * w + x * w / ImageHash.DHashW)
        x += 1
      }
      y += 1
    }
    var hsh = 0L
    y = 0
    while (y < ImageHash.DHashH) {
      var x = 0
      while (x < ImageHash.DHashH) {
        if (s(y * ImageHash.DHashW + x + 1) > s(y * ImageHash.DHashW + x))
          hsh |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hsh
  }

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
    NearDup.bandedHammingFrame(fps)
      .select(col("doc_id"), col("k0"), col("k1"), col("k2"), col("k3"),
        col("n_neighbors"),
        when(col("grp_size") > 1, lit(0L)).otherwise(col("min_h"))
          .cast(LongType).as("closest_hamming"))
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
    val bands = NearDup.SimhashBands
    val cap = NearDup.MaxBandBucket
    val thr = NearDup.HammingThreshold
    val keyList = (0 until bands).map(b => s"k$b").mkString(", ")
    val keyAggs = (0 until bands).map(j =>
      s"CAST(SUM(CASE WHEN b // 16 = $j THEN sb * (1 << (b % 16)) ELSE 0 END) AS INTEGER) AS k$j")
      .mkString(",\n    ")
    val bandSelects = (0 until bands).map(b =>
      s"SELECT rep, grp_size, $keyList, $b AS band, k$b AS key FROM grp")
      .mkString(" UNION ALL ")
    val hamming = (0 until bands)
      .map(i => s"bit_count(xor(a.k$i, b.k$i))").mkString(" + ")
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
       |grp AS (
       |  SELECT $keyList, COUNT(*) AS grp_size, MIN(doc_id) AS rep
       |  FROM fp GROUP BY $keyList),
       |banded AS ($bandSelects),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY band, key ORDER BY rep) AS rn
       |    FROM banded)
       |  WHERE rn <= $cap),
       |pairs AS (
       |  SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b,
       |    CAST($hamming AS BIGINT) AS hamming, b.grp_size AS sz_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.key = b.key AND a.rep <> b.rep),
       |near AS (SELECT * FROM pairs WHERE hamming <= $thr),
       |cross_agg AS (
       |  SELECT rep_a, CAST(SUM(sz_b) AS BIGINT) AS cross_n, MIN(hamming) AS min_h
       |  FROM near GROUP BY rep_a)
       |SELECT f.doc_id, f.k0, f.k1, f.k2, f.k3,
       |  CAST(g.grp_size - 1 + COALESCE(c.cross_n, 0) AS BIGINT) AS n_neighbors,
       |  CAST(CASE WHEN g.grp_size > 1 THEN 0 ELSE c.min_h END AS BIGINT) AS closest_hamming
       |FROM fp f
       |JOIN grp g USING ($keyList)
       |LEFT JOIN cross_agg c ON c.rep_a = g.rep""".stripMargin
  }
}
