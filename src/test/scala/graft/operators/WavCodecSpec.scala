package graft.operators

import graft.SparkSpec

class WavCodecSpec extends SparkSpec {

  test("WAV encode/decode roundtrip preserves samples and format") {
    val samples = Array.tabulate(1000)(i => ((i * 37) % 20001 - 10000).toShort)
    val bytes = WavCodec.encode(samples, 16000)
    assert(WavCodec.isWav(bytes))
    val w = WavCodec.decode(bytes)
    assert(w.sampleRate == 16000 && w.channels == 1)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("decoder skips foreign chunks and rejects non-PCM input") {
    val samples = Array.tabulate(100)(i => (i * 100).toShort)
    val base = WavCodec.encode(samples, 8000)
    // splice a LIST chunk between fmt and data (word-aligned, 6 bytes + pad)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    val w = WavCodec.decode(spliced)
    assert(w.samples.toSeq == samples.toSeq)
    intercept[IllegalArgumentException] {
      WavCodec.decode("not audio at all".getBytes("UTF-8"))
    }
  }

  test("DSP features match closed forms on a pure sine") {
    val sr = 8000
    val freq = 200.0
    val amp = 0.5
    val n = sr  // 1 second
    val sine = Array.tabulate(n)(i =>
      (amp * 32767.0 * math.sin(2 * math.Pi * freq * i / sr)).toShort)
    val f = WavCodec.features(WavCodec.decode(WavCodec.encode(sine, sr)))
    assert(math.abs(f.duration_s - 1.0) < 1e-9)
    assert(math.abs(f.rms - amp / math.sqrt(2)) < 0.01, f.rms)        // A/sqrt(2)
    assert(math.abs(f.peak - amp) < 0.01, f.peak)
    assert(math.abs(f.zero_crossing_rate - 2 * freq / sr) < 0.005,    // 2f/sr
      f.zero_crossing_rate)
  }

  test("distributed audio pipeline: synthetic WAV corpus decodes to sane features") {
    val audio = Multimodal.audioTable(spark, sf0001)
    val feats = Multimodal.audioFeatures(audio, batchSize = 16).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(math.abs(f.duration_s - 0.25) < 1e-9, f.toString)
      assert(f.rms > 0.1 && f.rms < 0.6, f.toString)
      assert(f.peak >= f.rms && f.peak <= 0.81, f.toString)
      assert(f.zero_crossing_rate > 0.01 && f.zero_crossing_rate < 0.23, f.toString)
    }
  }
}
