package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._


/** Perceptual image hashing — the image leg of the near-duplicate story
  * (text rides SimHash/MinHash in [[NearDup]], embeddings ride hyperplane
  * LSH; this closes the multimodal triangle).
  *
  * The hash is dHash (difference hash): nearest-neighbor resize to 9×8,
  * integer BT.601 luma, one bit per horizontally-adjacent pixel pair —
  * 64 bits total. Integer arithmetic end to end, so the hash is
  * ENGINE-EXACT: the DuckDB oracle replays resize+luma+compare as a closed
  * form of doc_id (the synthetic raster contract, Multimodal.imageTable)
  * while the Spark side round-trips every payload through the real PNG
  * codec. Near-dup pairs then ride the SAME banded-hamming machinery as
  * SimHash ([[NearDup.bandedHammingFrame]]): 4×16-bit bands, pigeonhole
  * candidate generation, per-bucket cap — never all pairs.
  *
  * Scale shape at 100 TB: hashing is a narrow mapPartitions over the image
  * payloads (or pointer fetches — MediaStore composes), output is 8 bytes
  * + 4 band keys per image; the pair stage touches only band buckets. The
  * whole pipeline shuffles fingerprints, never pixels.
  */
object ImageHash {

  val DHashW = 9
  val DHashH = 8

  /** 64-bit difference hash of a decoded raster: resize to 9×8, integer
    * luma `(77R+150G+29B)>>8`, bit `y*8+x` set iff `luma(x+1,y) >
    * luma(x,y)`. Gradient signs survive brightness/contrast shifts, which
    * is what makes dHash a NEAR-dup hash rather than a checksum. */
  def dHash(img: ImageCodec.Image): Long = {
    val r = ImageCodec.resize(img, DHashW, DHashH)
    val luma = new Array[Int](DHashW * DHashH)
    var i = 0
    while (i < luma.length) {
      val p = r.rgb(i)
      luma(i) = (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) +
        29 * (p & 0xff)) >> 8
      i += 1
    }
    var h = 0L
    var y = 0
    while (y < DHashH) {
      var x = 0
      while (x < DHashH) { // 8 comparisons per row (9 pixels)
        if (luma(y * DHashW + x + 1) > luma(y * DHashW + x))
          h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** (doc_id, k0..k3): the hash split into four 16-bit band keys (bit p
    * lands in band p/16) — the frame [[NearDup.bandedHammingFrame]]
    * consumes. Real decode per image, narrow mapPartitions, no shuffle. */
  def dhashKeys(images: Dataset[Multimodal.ImageRow]): DataFrame = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.map { im =>
      val h = dHash(ImageCodec.decode(im.content))
      (im.doc_id, (h & 0xffffL).toInt, ((h >>> 16) & 0xffffL).toInt,
        ((h >>> 32) & 0xffffL).toInt, ((h >>> 48) & 0xffffL).toInt)
    }).toDF("doc_id", "k0", "k1", "k2", "k3")
  }

  /** q_image_neardup — every image with its band keys (the hash identity;
    * 1<<63 overflows a DuckDB BIGINT shift, so the oracle never assembles
    * the full 64-bit value) and its symmetric neighbor stats within
    * hamming ≤ [[NearDup.HammingThreshold]]. Zero-neighbor images stay in
    * the output: the hash values themselves are the primary gate. */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame = {
    val fps = dhashKeys(Multimodal.imageTable(spark, dir)).cache()
    fps.count()
    NearDup.keepAllNeighborSelect(NearDup.bandedHammingFrame(fps))
  }

  /** Oracle: the synthetic raster is pixel `i` of a w×h image with
    * `r=(id*31+i*7)%256, g=(id*17+i*13)%256, b=(id*29+i*3)%256`
    * (Multimodal.imageTable); nearest-neighbor resize samples source index
    * `(y*h/8)*w + (x*w/9)` (ImageCodec.resize). DuckDB replays that closed
    * form; band keys aggregate per-bit CASE terms exactly like the simhash
    * oracle, and the neighbor stats mirror simhashPairsSql. */
  val imageNearDupSql: String = {
    val keyAggs = (0 until NearDup.SimhashBands).map(b =>
      s"CAST(SUM(CASE WHEN p // 16 = $b THEN bit * (1 << (p % 16)) ELSE 0 END) AS INTEGER) AS k$b")
      .mkString(",\n    ")
    s"""WITH pix AS (
       |  SELECT doc_id, y, x,
       |    ((y * (doc_id % 12 + 4)) // 8) * (doc_id % 16 + 4)
       |      + (x * (doc_id % 16 + 4)) // 9 AS i
       |  FROM documents CROSS JOIN range(8) ys(y) CROSS JOIN range(9) xs(x)),
       |lum AS (
       |  SELECT doc_id, y, x,
       |    (77 * ((doc_id * 31 + i * 7) % 256)
       |     + 150 * ((doc_id * 17 + i * 13) % 256)
       |     + 29 * ((doc_id * 29 + i * 3) % 256)) // 256 AS l
       |  FROM pix),
       |bits AS (
       |  SELECT a.doc_id, a.y * 8 + a.x AS p,
       |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
       |  FROM lum a JOIN lum b
       |    ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
       |  WHERE a.x < 8),
       |fp AS (
       |  SELECT doc_id,
       |    $keyAggs
       |  FROM bits GROUP BY doc_id),
       |${NearDup.bandedHammingTailSql}""".stripMargin
  }
}
