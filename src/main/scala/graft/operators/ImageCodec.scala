package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** Real PNG/BMP image codec — pure JVM via `javax.imageio` (part of the
  * JDK, no native libraries), so the IMAGE modality of the multimodal
  * family is genuinely decoded rather than stubbed (the same move that made
  * audio real in [[WavCodec]]; only video remains stubbed — its codecs need
  * native libraries this container lacks).
  *
  * The decoded representation is a packed RGB raster (`Array[Int]` of
  * 0xRRGGBB, row-major). PNG is lossless for 8-bit RGB, so
  * `decode(encodePng(img)) == img` bit-for-bit — asserted in
  * MultimodalSpec. All raster operations (resize, features) are implemented
  * directly on the pixel array, NOT through Java2D rendering, so results
  * are deterministic across JVMs and platforms.
  */
object ImageCodec {

  final case class Image(width: Int, height: Int, rgb: Array[Int])

  /** Lossless PNG bytes for a packed-RGB raster. */
  def encodePng(img: Image): Array[Byte] = encode(img, "png")

  /** BMP bytes (also lossless for 24-bit RGB). */
  def encodeBmp(img: Image): Array[Byte] = encode(img, "bmp")

  private def encode(img: Image, format: String): Array[Byte] = {
    require(img.rgb.length == img.width * img.height,
      s"raster size ${img.rgb.length} != ${img.width}x${img.height}")
    val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
    bi.setRGB(0, 0, img.width, img.height, img.rgb, 0, img.width)
    val out = new ByteArrayOutputStream()
    // explicit MEMORY-cached stream: ImageIO.write(_, _, OutputStream) goes
    // through createImageOutputStream, which under the default
    // ImageIO.getUseCache() backs every call with a TEMP FILE on disk — one
    // file create+write+delete per encoded payload in the executors' hot
    // path. Payloads here are KBs; cache them on heap.
    val writers = ImageIO.getImageWritersByFormatName(format)
    require(writers.hasNext, s"no ImageIO writer for $format")
    val writer = writers.next()
    val ios = new MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(bi)
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M'

  /** Decode PNG/BMP (any format ImageIO can read) to a packed RGB raster.
    * Throws IllegalArgumentException on undecodable input. */
  def decode(bytes: Array[Byte]): Image = {
    // memory-cached stream for the same temp-file reason as encode; the
    // ImageInputStream overload keeps ImageIO's format auto-detection
    val bi = ImageIO.read(
      new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes)))
    require(bi != null, "undecodable image payload")
    val (w, h) = (bi.getWidth, bi.getHeight)
    // getRGB converts whatever the source color model is to packed ARGB;
    // masking off alpha gives the canonical 0xRRGGBB raster
    val px = bi.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xffffff)
    Image(w, h, px)
  }

  /** Nearest-neighbor resize on the decoded raster. Pixel (x,y) of the
    * target samples source pixel (x*sw/tw, y*sh/th) — integer arithmetic,
    * deterministic, no Java2D interpolation. */
  def resize(img: Image, targetW: Int, targetH: Int): Image = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val out = Array.ofDim[Int](targetW * targetH)
    var y = 0
    while (y < targetH) {
      val sy = y * img.height / targetH
      var x = 0
      while (x < targetW) {
        out(y * targetW + x) = img.rgb(sy * img.width + x * img.width / targetW)
        x += 1
      }
      y += 1
    }
    Image(targetW, targetH, out)
  }

  final case class ImageFeatures(
      width: Int, height: Int, n_px: Long,
      mean_r: Double, mean_g: Double, mean_b: Double,
      max_luma: Int, min_luma: Int)

  /** Per-channel means + integer-luma extrema. Integer sums divided by the
    * pixel count in double — exact and order-independent, so the values
    * hash-match an oracle that computes the same closed form. Luma is the
    * integer BT.601 approximation (77R+150G+29B)>>8, branch-free. */
  def features(img: Image): ImageFeatures = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var mxl = Int.MinValue; var mnl = Int.MaxValue
    var i = 0
    while (i < img.rgb.length) {
      val p = img.rgb(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      sr += r; sg += g; sb += b
      val l = (77 * r + 150 * g + 29 * b) >> 8
      if (l > mxl) mxl = l
      if (l < mnl) mnl = l
      i += 1
    }
    val n = img.rgb.length.toLong
    if (n == 0) ImageFeatures(img.width, img.height, 0, 0, 0, 0, 0, 0)
    else ImageFeatures(img.width, img.height, n,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, mxl, mnl)
  }
}
