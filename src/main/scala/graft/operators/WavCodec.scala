package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Real RIFF/WAV PCM-16 codec — pure JVM, no external libraries, so the
  * AUDIO modality of the multimodal family is genuinely decoded rather than
  * stubbed (images/video stay stubbed: their codecs need native libraries
  * this container lacks; reference capability per SURVEY §2 multimodal
  * extension).
  *
  * Supports the canonical WAV layout: RIFF header, `fmt ` chunk (PCM,
  * 16-bit, any channel count / sample rate), `data` chunk; other chunks
  * (LIST, cue, …) are skipped. Encode writes mono PCM-16.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Mono PCM-16 WAV bytes for the given samples. */
  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                      // PCM
      .putShort(1)                      // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)           // byte rate
      .putShort(2)                      // block align
      .putShort(16)                     // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Decode PCM-16 WAV; throws IllegalArgumentException on malformed or
    * non-PCM-16 input. */
  def decode(bytes: Array[Byte]): Wav = {
    require(isWav(bytes), "not a RIFF/WAVE payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(12)
    var sampleRate = 0
    var channels = 0
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      val id = Array.fill(4)(buf.get()).map(_.toChar).mkString
      val len = buf.getInt
      val next = buf.position() + len + (len & 1)   // chunks are word-aligned
      id match {
        case "fmt " =>
          val fmt = buf.getShort
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort                  // byte rate, block align
          val bits = buf.getShort
          require(fmt == 1 && bits == 16, s"unsupported WAV: fmt=$fmt bits=$bits")
        case "data" =>
          require(channels > 0, "data chunk before fmt chunk")
          val n = math.min(len, buf.remaining()) / 2
          samples = Array.ofDim[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort; i += 1 }
        case _ => ()                                 // skip LIST/cue/etc.
      }
      buf.position(math.min(next, buf.limit()))
    }
    require(samples != null, "no data chunk")
    Wav(sampleRate, channels, samples)
  }

  final case class AudioFeatures(
      duration_s: Double,
      rms: Double,            // root-mean-square amplitude, normalized to [0,1]
      peak: Double,           // max |sample| normalized
      zero_crossing_rate: Double)

  /** Standard audio descriptors over decoded samples (mono view: channels
    * interleaved are treated as one stream, as for coarse quality checks). */
  def features(w: Wav): AudioFeatures = {
    val n = w.samples.length
    if (n == 0) return AudioFeatures(0.0, 0.0, 0.0, 0.0)
    var sumSq = 0.0
    var peak = 0
    var crossings = 0
    var i = 0
    while (i < n) {
      val s = w.samples(i).toInt
      sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && ((s >= 0) != (w.samples(i - 1) >= 0))) crossings += 1
      i += 1
    }
    val norm = 32768.0
    AudioFeatures(
      duration_s = n.toDouble / (w.sampleRate * w.channels),
      rms = math.sqrt(sumSq / n) / norm,
      peak = peak / norm,
      zero_crossing_rate = if (n > 1) crossings.toDouble / (n - 1) else 0.0)
  }
}
