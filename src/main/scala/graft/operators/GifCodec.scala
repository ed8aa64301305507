package graft.operators

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** Real multi-frame (animated) GIF codec — pure JVM via `javax.imageio`,
  * the same move that made audio ([[WavCodec]]) and still images
  * ([[ImageCodec]]) genuinely decoded. This gives the VIDEO modality a real
  * container + codec: a video is a sequence of frames, and the JDK's GIF
  * plugin reads and writes frame SEQUENCES natively.
  *
  * GIF is palette-indexed (≤256 colors per frame), so arbitrary 24-bit RGB
  * would quantize lossily. Frames here are 8-bit GRAYSCALE rasters encoded
  * with an explicit 256-level gray palette (`IndexColorModel`), which GIF
  * represents exactly — `decodeFrames(encodeFrames(v)) == v` bit-for-bit,
  * asserted in MultimodalSpec. Frames are written full-size with no
  * inter-frame delta, so each decodes independently of its predecessors.
  */
object GifCodec {

  /** One grayscale frame: row-major 0..255 values. */
  final case class GrayFrame(width: Int, height: Int, gray: Array[Int])

  // one shared instance: IndexColorModel is immutable and building the
  // 256-entry ramp per encoded video was per-payload garbage in the hot path
  private val grayIcm: IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8'

  /** Encode frames as a real animated GIF (one image per frame in the GIF
    * stream, shared exact gray palette). */
  def encodeFrames(frames: Seq[GrayFrame]): Array[Byte] = {
    require(frames.nonEmpty, "a video needs at least one frame")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    // explicit MEMORY-cached stream: ImageIO.createImageOutputStream backs
    // every call with a TEMP FILE under the default useCache setting — one
    // disk create+write+delete per encoded payload (see ImageCodec.encode)
    val ios = new MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      // interlace OFF: the JDK pair disagrees on interlaced images shorter
      // than 5 rows (writer defaults to interlaced; reading one back shifts
      // rows — reproduced on 17.0.20: every (w, h<=4) mismatches, h>=5 is
      // clean; progressive MODE_DISABLED round-trips every size exactly)
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        require(f.gray.length == f.width * f.height,
          s"frame size ${f.gray.length} != ${f.width}x${f.height}")
        val bi = new BufferedImage(f.width, f.height,
          BufferedImage.TYPE_BYTE_INDEXED, grayIcm)
        val raster = bi.getRaster
        var y = 0
        while (y < f.height) {
          var x = 0
          while (x < f.width) {
            raster.setSample(x, y, 0, f.gray(y * f.width + x) & 0xff)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new IIOImage(bi, null, null), param)
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  /** Decode ALL frames of a GIF stream back to grayscale rasters. */
  def decodeFrames(bytes: Array[Byte]): Seq[GrayFrame] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    // memory-cached: same per-payload temp-file avoidance as encodeFrames
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, "undecodable GIF payload")
      (0 until n).map { i =>
        val bi = reader.read(i)
        val (w, h) = (bi.getWidth, bi.getHeight)
        // gray palette: R == G == B, the low byte is the gray level
        val gray = bi.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xff)
        GrayFrame(w, h, gray)
      }
    } finally {
      iis.close()
      reader.dispose()
    }
  }

  /** Decode ONLY the selected frame indices — the frame-sampling fast path:
    * the reader seeks the GIF stream per image, so skipped frames' pixel
    * data is never expanded (the LZW decode cost of a stride-10 sample is
    * ~1/10th of a full decode). */
  def decodeFramesAt(bytes: Array[Byte], indices: Seq[Int]): Seq[(Int, GrayFrame)] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    // memory-cached: same per-payload temp-file avoidance as encodeFrames
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      indices.filter(i => i >= 0 && i < n).map { i =>
        val bi = reader.read(i)
        val (w, h) = (bi.getWidth, bi.getHeight)
        i -> GrayFrame(w, h, bi.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xff))
      }
    } finally {
      iis.close()
      reader.dispose()
    }
  }

  final case class FrameFeatures(
      n_px: Long, mean_gray: Double, max_gray: Int, min_gray: Int)

  /** Integer-sum stats over one frame — exact, order-independent. */
  def features(f: GrayFrame): FrameFeatures = {
    var s = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
    var i = 0
    while (i < f.gray.length) {
      val g = f.gray(i)
      s += g; if (g > mx) mx = g; if (g < mn) mn = g
      i += 1
    }
    val n = f.gray.length.toLong
    if (n == 0) FrameFeatures(0, 0.0, 0, 0)
    else FrameFeatures(n, s.toDouble / n, mx, mn)
  }
}
