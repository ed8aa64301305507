package graft.operators

import graft.SparkSpec

/** Energy-delta audio hash pinned on PLANTED fixtures (the oracle gate
  * proves engine agreement on the synthetic corpus; these prove the hash
  * finds actual near-duplicate audio and rejects different material). */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  private def saw(period: Int, amp: Int, gainNum: Int = 1, gainDen: Int = 1,
      spikeEvery: Int = 0, spike: Int = 0): Array[Short] =
    Array.tabulate(AudioHash.SamplesHashed) { i =>
      val v = ((i % period) * amp / period - amp / 2) * gainNum / gainDen
      (if (spikeEvery > 0 && i % spikeEvery == 0) v + spike else v).toShort
    }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def hashOf(s: Array[Short]): Long =
    AudioHash.aHash(WavCodec.decode(WavCodec.encode(s, 8000)))

  test("aHash: gain changes are invisible, small spikes are near, different periods are far") {
    val base = hashOf(saw(40, 8000))
    // uniform gain scales every frame energy by the same factor — every
    // adjacent-frame comparison survives exactly
    assert(ham(base, hashOf(saw(40, 8000, gainNum = 3, gainDen = 4))) == 0)
    // a sparse impulse perturbs a handful of frames: near, not identical
    val spiked = hashOf(saw(40, 8000, spikeEvery = 503, spike = 700))
    assert(ham(base, spiked) <= NearDup.HammingThreshold)
    // different period = different material: far
    assert(ham(base, hashOf(saw(53, 8000))) > NearDup.HammingThreshold)
  }

  test("planted near-dups surface through the banded path; different audio does not") {
    def row(id: Long, s: Array[Short]) =
      Multimodal.AudioRow(id, WavCodec.encode(s, 8000), 8000)
    val ds = Seq(
      row(1L, saw(40, 8000)),                                  // base
      row(2L, saw(40, 8000, gainNum = 1, gainDen = 2)),        // re-level: identical hash
      row(3L, saw(40, 8000, spikeEvery = 503, spike = 700)),   // near
      row(4L, saw(61, 9000))                                   // different material
    ).toDS()
    val fps = AudioHash.ahashKeys(ds).cache()
    try {
      val stats = NearDup.bandedHammingFrame(fps)
        .select("doc_id", "n_neighbors").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stats(1L) >= 2L, s"base should see docs 2 and 3: $stats")
      assert(stats(2L) >= 1L && stats(3L) >= 1L, stats.toString)
      assert(stats(4L) == 0L, s"different audio must have no neighbors: $stats")
    } finally fps.unpersist()
  }

  test("the oracle corpus plants pair near-dups: doc 2k and 2k+1 collide within threshold") {
    val fps = AudioHash.ahashKeys(AudioHash.audioIntTable(spark, sf0001))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1).toLong | r.getInt(2).toLong << 16 |
          r.getInt(3).toLong << 32 | r.getInt(4).toLong << 48)).toMap
    val pairs = fps.keys.filter(_ % 2 == 0).flatMap(k =>
      fps.get(k + 1).map(h => ham(fps(k), h)))
    assert(pairs.nonEmpty && pairs.forall(_ <= NearDup.HammingThreshold),
      pairs.toSeq.sorted.takeRight(5).toString)
  }
}
