package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Perceptual AUDIO hashing — the fourth near-duplicate modality (text
  * rides SimHash/MinHash, embeddings ride hyperplane LSH, images/video
  * ride dHash; this closes the set).
  *
  * The hash is an energy-delta hash: decode the WAV (REAL RIFF/PCM-16
  * codec, [[WavCodec]]), sum |sample| over 65 consecutive 31-sample
  * frames, one bit per adjacent-frame comparison — 64 bits. Like dHash's
  * gradient signs, energy DELTAS survive uniform gain changes exactly
  * (scaling preserves every comparison), which is what makes this a
  * NEAR-dup hash: re-encodes at a different level collide, different
  * material does not. Integer arithmetic end to end.
  *
  * The oracle-gated corpus ([[audioIntTable]]) is sawtooth audio in CLOSED
  * INTEGER FORM — period/amplitude/impulse-spike all integer functions of
  * doc_id — because libm `sin` is not bit-identical across engines (the
  * reason the sine corpus in [[Multimodal.audioTable]] is spec-only): the
  * DuckDB oracle replays samples → frame energies → bits → band keys as
  * exact integer SQL while the Spark side round-trips every payload
  * through the real WAV codec. Odd docs carry a small impulse spike, so
  * planted pairs land at hamming 0-3 and exercise the cross-group banded
  * path, not just the identical-fingerprint collapse.
  *
  * Pairs then ride the SAME banded-hamming machinery as SimHash/dHash
  * ([[NearDup.bandedHammingFrame]]): 4×16-bit bands, pigeonhole candidate
  * generation, per-bucket cap — never all pairs. Scale shape at 100 TB:
  * hashing is a narrow mapPartitions over audio payloads (or pointer
  * fetches — MediaStore composes); everything after ships 8-byte
  * fingerprints — the pair stage shuffles band keys, never samples.
  */
object AudioHash {

  /** Frame geometry: 65 frames × 31 samples = 2015 samples hashed (the
    * first ~250 ms at 8 kHz); 64 adjacent-frame delta bits. */
  val Frames = 65
  val FrameLen = 31
  val SamplesHashed: Int = Frames * FrameLen

  /** 64-bit energy-delta hash of decoded PCM: bit p set iff
    * energy(p+1) > energy(p) over the first [[SamplesHashed]] samples.
    * Payloads shorter than that hash what they have (missing frames read
    * as zero energy). */
  def aHash(wav: WavCodec.Wav): Long = {
    val e = new Array[Long](Frames)
    val n = math.min(wav.samples.length, SamplesHashed)
    var i = 0
    while (i < n) {
      e(i / FrameLen) += math.abs(wav.samples(i).toLong)
      i += 1
    }
    var h = 0L
    var p = 0
    while (p < 64) {
      if (e(p + 1) > e(p)) h |= 1L << p
      p += 1
    }
    h
  }

  /** Deterministic integer-waveform WAV corpus: doc d renders a sawtooth
    * with period `32 + ((d/2) % 37)` and amplitude `8000 + ((d/2) % 5) *
    * 2048`; odd docs add a +700 impulse at every 503rd sample. Docs 2k and
    * 2k+1 are therefore planted near-duplicates (same wave, tiny spikes),
    * while different periods land far apart (hamming ≥ ~20). Real PCM-16
    * WAV bytes via [[WavCodec.encode]]. */
  def audioIntTable(spark: SparkSession, dir: String,
      sampleRate: Int = 8000): Dataset[Multimodal.AudioRow] = {
    import spark.implicits._
    // spread: WAV synthesis+encode+decode dominates and must not inherit the
    // single-row-group source's ONE-partition layout (no-op at real scale)
    Tables.spread(Tables.documents(spark, dir).select(col("doc_id"))).as[Long].map { d =>
      val p = (32 + ((d / 2) % 37)).toInt
      val a = (8000 + ((d / 2) % 5) * 2048).toInt
      val spike = (d % 2).toInt * 700
      val samples = Array.tabulate(SamplesHashed) { i =>
        val v = (i % p) * a / p - a / 2
        (if (i % 503 == 0) v + spike else v).toShort
      }
      Multimodal.AudioRow(d, WavCodec.encode(samples, sampleRate), sampleRate)
    }
  }

  /** (doc_id, k0..k3): the hash split into four 16-bit band keys. Real
    * WAV decode per payload, narrow mapPartitions, no shuffle. */
  def ahashKeys(audio: Dataset[Multimodal.AudioRow]): DataFrame = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(_.map { a =>
      val h = aHash(WavCodec.decode(a.content))
      (a.doc_id, (h & 0xffffL).toInt, ((h >>> 16) & 0xffffL).toInt,
        ((h >>> 32) & 0xffffL).toInt, ((h >>> 48) & 0xffffL).toInt)
    }).toDF("doc_id", "k0", "k1", "k2", "k3")
  }

  /** q_audio_neardup — every audio doc with its band keys (the hash
    * identity) and its symmetric neighbor stats within hamming ≤
    * [[NearDup.HammingThreshold]]; zero-neighbor docs stay. */
  def audioNearDup(spark: SparkSession, dir: String): DataFrame = {
    val fps = ahashKeys(audioIntTable(spark, dir)).cache()
    fps.count()
    NearDup.keepAllNeighborSelect(NearDup.bandedHammingFrame(fps))
  }

  /** Oracle: replay samples → frame energies → delta bits → band keys in
    * exact integer SQL (all divisions on non-negative operands, so `//`
    * truncation equals the JVM's), then the shared banded-hamming tail. */
  val audioNearDupSql: String = {
    val keyAggs = (0 until NearDup.SimhashBands).map(b =>
      s"CAST(SUM(CASE WHEN p // 16 = $b THEN bit * (1 << (p % 16)) ELSE 0 END) AS INTEGER) AS k$b")
      .mkString(",\n    ")
    s"""WITH par AS (
       |  SELECT doc_id, 32 + ((doc_id // 2) % 37) AS p,
       |    8000 + ((doc_id // 2) % 5) * 2048 AS a,
       |    (doc_id % 2) * 700 AS spike
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, i,
       |    (i % p) * a // p - a // 2
       |      + CASE WHEN i % 503 = 0 THEN spike ELSE 0 END AS v
       |  FROM par CROSS JOIN range($SamplesHashed) t(i)),
       |e AS (
       |  SELECT doc_id, i // $FrameLen AS f, SUM(ABS(v)) AS en
       |  FROM s GROUP BY 1, 2),
       |bits AS (
       |  SELECT a.doc_id, a.f AS p,
       |    CASE WHEN b.en > a.en THEN 1 ELSE 0 END AS bit
       |  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.f = a.f + 1
       |  WHERE a.f < 64),
       |fp AS (
       |  SELECT doc_id,
       |    $keyAggs
       |  FROM bits GROUP BY doc_id),
       |${NearDup.bandedHammingTailSql}""".stripMargin
  }
}
