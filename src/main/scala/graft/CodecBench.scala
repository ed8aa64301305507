package graft

/** Dev scratch: time the pure-JVM codecs outside Spark.
  * Usage: runMain graft.CodecBench [n]
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[codec] $label%-28s ${(System.nanoTime() - t0) / 1e6}%9.1f ms"); r
    }
    import graft.operators._
    // ---- image (PNG) --------------------------------------------------
    def raster(id: Long) = {
      val w = (id % 16 + 4).toInt; val h = (id % 12 + 4).toInt
      ImageCodec.Image(w, h, Array.tabulate(w * h) { i =>
        val r = ((id * 31 + i * 7L) % 256).toInt
        val g = ((id * 17 + i * 13L) % 256).toInt
        val b = ((id * 29 + i * 3L) % 256).toInt
        (r << 16) | (g << 8) | b
      })
    }
    for (round <- 1 to 3) {
      val rasters = time(s"r$round raster synth x$n")((0L until n.toLong).map(raster))
      val pngs = time(s"r$round PNG encode x$n")(rasters.map(ImageCodec.encodePng(_)))
      time(s"r$round PNG decode x$n")(pngs.foreach(ImageCodec.decode))
      // ---- video (GIF) --------------------------------------------------
      val vids = time(s"r$round GIF synth+encode x$n")((0L until n.toLong).map { id =>
        val w = (id % 12 + 4).toInt; val h = (id % 8 + 4).toInt
        val nf = (id % 6 + 2).toInt
        GifCodec.encodeFrames((0 until nf).map(f =>
          GifCodec.GrayFrame(w, h, Array.tabulate(w * h)(i =>
            ((id * 31 + f * 11 + i * 7L) % 256).toInt))))
      })
      time(s"r$round GIF decode x$n")(vids.foreach(GifCodec.decodeFrames))
      // ---- audio (WAV) --------------------------------------------------
      val wavs = time(s"r$round WAV synth+encode x$n")((0L until n.toLong).map { d =>
        val p = (32 + ((d / 2) % 37)).toInt
        val a = (8000 + ((d / 2) % 5) * 2048).toInt
        val spike = (d % 2).toInt * 700
        WavCodec.encode(Array.tabulate(AudioHash.SamplesHashed) { i =>
          val v = (i % p) * a / p - a / 2
          (if (i % 503 == 0) v + spike else v).toShort
        }, 8000)
      })
      time(s"r$round WAV decode x$n")(wavs.foreach(WavCodec.decode))
    }
  }
}
