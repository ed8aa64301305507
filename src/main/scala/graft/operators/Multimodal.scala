package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus per-partition batched decode / feature-extract /
  * resize / frame-sample.
  *
  * The Spark-side plumbing is real — schema, partitioning, typed Dataset
  * encoders, batched per-partition iteration (the JVM analogue of an
  * Arrow-batched pandas UDF) — and so are ALL THREE codecs, pure JVM:
  * AUDIO via [[WavCodec]] (RIFF/PCM-16), IMAGE via [[ImageCodec]] (PNG/BMP,
  * javax.imageio), VIDEO via [[GifCodec]] (multi-frame animated GIF,
  * javax.imageio). No stubs remain; swapping GIF for an ffmpeg container
  * changes only the codec object.
  *
  * [[extractFeatures]] is the modality-agnostic payload pass: byte-level
  * stats of the raw binary column (size screening, corruption triage) — it
  * intentionally does NOT decode; the per-modality decoded paths are
  * [[audioFeatures]], [[imageFeatures]], and [[videoFrameFeatures]].
  *
  * Scale notes: payloads stay columnar in parquet (binary column), feature
  * extraction is a narrow mapPartitions (no shuffle), and batching bounds
  * per-row overhead. At 100 TB the binary column would typically hold object
  * -store pointers instead of payloads — that variant is [[MediaStore]]'s
  * pointer mode; the operator shape is identical.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      media_type: String,          // image | audio | video
      content: Array[Byte],        // opaque payload (here: utf-8 of text)
      width: Int, height: Int,     // image/video metadata
      sample_rate: Int,            // audio metadata
      n_frames: Int)               // video metadata

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      mean_byte: Double,
      max_byte: Int,
      min_byte: Int)

  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Wrap the documents table as a media table: binary payload + typed
    * metadata columns. Deterministic media_type assignment by doc_id.
    * No spread here: [[extractFeatures]] deliberately does not decode, so
    * the pass is scan-bound, not compute-bound — repartitioning the full
    * payload column costs more than the byte stats it would parallelize. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("media_type"),
        encode(col("text"), "UTF-8").as("content"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 16 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** Batched per-partition PAYLOAD feature extraction — byte-level stats of
    * the raw binary column, the modality-agnostic screening pass (size,
    * degenerate-payload detection) that deliberately does not decode.
    * Processes rows in fixed-size batches exactly like an Arrow-batched UDF
    * would receive them; the decoded paths are the per-modality functions
    * below. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val sig = m.content
          var sum = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
          var i = 0
          while (i < sig.length) {
            val b = sig(i) & 0xff
            sum += b; if (b > mx) mx = b; if (b < mn) mn = b
            i += 1
          }
          val n = sig.length.toLong
          MediaFeatures(m.doc_id, m.media_type, n,
            if (n == 0) 0.0 else sum.toDouble / n,
            if (n == 0) 0 else mx, if (n == 0) 0 else mn)
        }
      }
    }
  }

  // --------------------------------------------------------------------------
  // Real audio path: WAV payloads are genuinely decoded (WavCodec, pure
  // JVM) — the one modality whose codec needs no native library. Image and
  // video remain stubbed per the class doc.
  // --------------------------------------------------------------------------
  final case class AudioRow(
      doc_id: Long, content: Array[Byte], sample_rate: Int)
  final case class AudioFeatureRow(
      doc_id: Long, duration_s: Double, rms: Double, peak: Double,
      zero_crossing_rate: Double)

  /** Deterministic synthetic WAV corpus: each doc renders a real PCM-16
    * sine wave whose frequency/amplitude derive from doc_id — actual
    * encoded audio bytes, not text-as-bytes. */
  def audioTable(spark: SparkSession, dir: String, sampleRate: Int = 8000): Dataset[AudioRow] = {
    import spark.implicits._
    // spread: the WAV synthesis+encode below is the expensive part and must
    // not inherit the source file's single-row-group ONE-partition layout
    Tables.spread(Tables.documents(spark, dir).select(col("doc_id"))).as[Long].map { id =>
      val freq = 100.0 + (id % 40) * 20.0         // 100..880 Hz
      val amp = 0.2 + (id % 5) * 0.15             // 0.2..0.8
      val n = sampleRate / 4                      // 250 ms
      val samples = Array.tabulate(n)(i =>
        (amp * 32767.0 * math.sin(2 * math.Pi * freq * i / sampleRate)).toShort)
      AudioRow(id, WavCodec.encode(samples, sampleRate), sampleRate)
    }
  }

  /** Batched REAL decode + DSP feature extraction (duration, RMS, peak,
    * zero-crossing rate) — narrow mapPartitions, no shuffle, same batch
    * shape as extractFeatures. */
  def audioFeatures(audio: Dataset[AudioRow], batchSize: Int = 64): Dataset[AudioFeatureRow] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { a =>
        val f = WavCodec.features(WavCodec.decode(a.content))
        AudioFeatureRow(a.doc_id, f.duration_s, f.rms, f.peak, f.zero_crossing_rate)
      })
    }
  }

  // --------------------------------------------------------------------------
  // Real image path: PNG payloads genuinely encoded AND decoded via
  // ImageCodec (javax.imageio, pure JVM). The raster content is a closed
  // form of doc_id, so the oracle can compute identical features WITHOUT a
  // decoder — the Spark side still round-trips every payload through the
  // real PNG codec, which is what the query verifies.
  // --------------------------------------------------------------------------
  final case class ImageRow(
      doc_id: Long, content: Array[Byte], width: Int, height: Int)
  final case class ImageFeatureRow(
      doc_id: Long, width: Int, height: Int, n_px: Long,
      mean_r: Double, mean_g: Double, mean_b: Double,
      max_luma: Int, min_luma: Int)

  /** Deterministic synthetic raster corpus: each doc renders a small RGB
    * raster whose pixels are a closed form of doc_id, encoded as REAL PNG
    * bytes. Mirrors audioTable's real-WAV approach. */
  def imageTable(spark: SparkSession, dir: String): Dataset[ImageRow] = {
    import spark.implicits._
    // spread: PNG encode (and the decode downstream) dominates; see mediaTable
    Tables.spread(Tables.documents(spark, dir).select(col("doc_id"))).as[Long].map { id =>
      val w = (id % 16 + 4).toInt
      val h = (id % 12 + 4).toInt
      val rgb = Array.tabulate(w * h) { i =>
        val r = ((id * 31 + i * 7L)  % 256).toInt
        val g = ((id * 17 + i * 13L) % 256).toInt
        val b = ((id * 29 + i * 3L)  % 256).toInt
        (r << 16) | (g << 8) | b
      }
      ImageRow(id, ImageCodec.encodePng(ImageCodec.Image(w, h, rgb)), w, h)
    }
  }

  /** Batched REAL decode + raster feature extraction — narrow
    * mapPartitions, no shuffle, same batch shape as extractFeatures. */
  def imageFeatures(images: Dataset[ImageRow], batchSize: Int = 64): Dataset[ImageFeatureRow] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { im =>
        val f = ImageCodec.features(ImageCodec.decode(im.content))
        ImageFeatureRow(im.doc_id, f.width, f.height, f.n_px,
          f.mean_r, f.mean_g, f.mean_b, f.max_luma, f.min_luma)
      })
    }
  }

  /** Batched real decode → nearest-neighbor resize → re-encode. */
  def resizeImages(images: Dataset[ImageRow], targetW: Int, targetH: Int): Dataset[ImageRow] = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.map { im =>
      val out = ImageCodec.resize(ImageCodec.decode(im.content), targetW, targetH)
      ImageRow(im.doc_id, ImageCodec.encodePng(out), targetW, targetH)
    })
  }

  // --------------------------------------------------------------------------
  // Pointer mode: the same feature extractors over object-store POINTERS
  // instead of inline payloads (MediaStore.put/fetch) — the 100 TB contract
  // where parquet carries URIs and bytes are fetched next to the compute.
  // fetch + decode compose as two narrow mapPartitions; MultimodalSpec
  // asserts pointer-mode == payload-mode features on the same corpus.
  // --------------------------------------------------------------------------
  def imagePointers(images: Dataset[ImageRow], storeDir: String): Dataset[MediaStore.ObjectPtr] = {
    import images.sparkSession.implicits._
    MediaStore.put(images.map(r => r.doc_id -> r.content), storeDir)
  }

  /** Batched fetch-then-decode over pointers — same output as
    * [[imageFeatures]] when the store holds [[imageTable]]'s payloads. */
  def imageFeaturesFromStore(ptrs: Dataset[MediaStore.ObjectPtr],
      batchSize: Int = 64): Dataset[ImageFeatureRow] = {
    import ptrs.sparkSession.implicits._
    MediaStore.fetch(ptrs, batchSize).mapPartitions(_.map { case (id, bytes) =>
      val f = ImageCodec.features(ImageCodec.decode(bytes))
      ImageFeatureRow(id, f.width, f.height, f.n_px,
        f.mean_r, f.mean_g, f.mean_b, f.max_luma, f.min_luma)
    })
  }

  // --------------------------------------------------------------------------
  // Real video path: multi-frame animated GIF payloads genuinely encoded AND
  // decoded via GifCodec (javax.imageio, pure JVM) — frames are exact
  // 256-gray rasters (GIF's palette represents them losslessly), each a
  // closed form of (doc_id, frame_idx), so the oracle replays the math
  // without a decoder while the Spark side round-trips every payload
  // through the real GIF codec.
  // --------------------------------------------------------------------------
  final case class VideoRow(
      doc_id: Long, content: Array[Byte], width: Int, height: Int, n_frames: Int)
  final case class VideoFrameRow(
      doc_id: Long, frame_idx: Int, n_px: Long,
      mean_gray: Double, max_gray: Int, min_gray: Int)

  /** Closed-form gray value of pixel `i` of frame `f` of video `id`. */
  private[operators] def videoPixel(id: Long, f: Int, i: Int): Int =
    ((id * 31 + f * 11 + i * 7L) % 256).toInt

  /** Deterministic synthetic video corpus: each doc renders n_frames real
    * grayscale rasters encoded as a REAL animated GIF. */
  def videoTable(spark: SparkSession, dir: String): Dataset[VideoRow] = {
    import spark.implicits._
    // spread: GIF encode (and the decode downstream) dominates; see mediaTable
    Tables.spread(Tables.documents(spark, dir).select(col("doc_id"))).as[Long].map { id =>
      val w = (id % 12 + 4).toInt
      val h = (id % 8 + 4).toInt
      val nf = (id % 6 + 2).toInt
      val frames = (0 until nf).map(f =>
        GifCodec.GrayFrame(w, h, Array.tabulate(w * h)(i => videoPixel(id, f, i))))
      VideoRow(id, GifCodec.encodeFrames(frames), w, h, nf)
    }
  }

  /** Batched REAL frame sampling: decode every `stride`-th frame of each
    * GIF payload — skipped frames are sought past, not decoded
    * (GifCodec.decodeFramesAt), the property that makes stride sampling
    * worth doing at scale. Narrow mapPartitions, no shuffle. */
  def sampleFrames(videos: Dataset[VideoRow], stride: Int,
      batchSize: Int = 64): Dataset[Frame] = {
    import videos.sparkSession.implicits._
    require(stride >= 1, "stride must be >= 1")
    videos.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.flatMap { v =>
        GifCodec.decodeFramesAt(v.content, 0 until v.n_frames by stride)
          .map { case (f, fr) =>
            Frame(v.doc_id, f, fr.gray.map(_.toByte))
          }
      })
    }
  }

  /** Batched real decode + per-frame stats for sampled frames. */
  def videoFrameFeatures(videos: Dataset[VideoRow], stride: Int,
      batchSize: Int = 64): Dataset[VideoFrameRow] = {
    import videos.sparkSession.implicits._
    videos.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.flatMap { v =>
        GifCodec.decodeFramesAt(v.content, 0 until v.n_frames by stride)
          .map { case (f, fr) =>
            val ft = GifCodec.features(fr)
            VideoFrameRow(v.doc_id, f, ft.n_px, ft.mean_gray, ft.max_gray, ft.min_gray)
          }
      })
    }
  }

  // --------------------------------------------------------------------------
  // q_video_frames — end-to-end: synthesize frames → encode animated GIF →
  // batched REAL stride-2 frame sampling + decode → per-frame stats. The
  // oracle replays the closed-form pixel math in DuckDB lambdas; a codec
  // bug on either side of the round-trip breaks the hash.
  // --------------------------------------------------------------------------
  val FrameStride = 2

  def videoFramesQuery(spark: SparkSession, dir: String): DataFrame =
    videoFrameFeatures(videoTable(spark, dir), FrameStride).toDF()
      .select(col("doc_id"), col("frame_idx"), col("n_px"),
        round(col("mean_gray"), 6).as("mean_gray"),
        col("max_gray"), col("min_gray"))

  val videoFramesSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, UNNEST(range(0, doc_id % 6 + 2, $FrameStride)) AS frame_idx,
       |    (doc_id % 12 + 4) * (doc_id % 8 + 4) AS n
       |  FROM documents)
       |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       |  CAST(n AS BIGINT) AS n_px,
       |  ROUND(CAST(list_sum(list_transform(range(n),
       |    i -> (doc_id * 31 + frame_idx * 11 + i * 7) % 256)) AS DOUBLE) / n, 6) AS mean_gray,
       |  CAST(list_max(list_transform(range(n),
       |    i -> (doc_id * 31 + frame_idx * 11 + i * 7) % 256)) AS INTEGER) AS max_gray,
       |  CAST(list_min(list_transform(range(n),
       |    i -> (doc_id * 31 + frame_idx * 11 + i * 7) % 256)) AS INTEGER) AS min_gray
       |FROM f""".stripMargin

  // --------------------------------------------------------------------------
  // q_image_features — end-to-end: synthesize raster → encode PNG → batched
  // REAL decode → features. The oracle replays the closed-form raster in
  // DuckDB list lambdas; a codec bug on either side of the round-trip
  // breaks the hash. Integer sums / pixel count in double are exact, so no
  // tolerance is needed beyond the shared round(,6).
  // --------------------------------------------------------------------------
  def imageFeaturesQuery(spark: SparkSession, dir: String): DataFrame =
    imageFeatures(imageTable(spark, dir)).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_px"),
        round(col("mean_r"), 6).as("mean_r"),
        round(col("mean_g"), 6).as("mean_g"),
        round(col("mean_b"), 6).as("mean_b"),
        col("max_luma"), col("min_luma"))

  val imageFeaturesSql: String =
    """SELECT doc_id,
      |  CAST(doc_id % 16 + 4 AS INTEGER) AS width,
      |  CAST(doc_id % 12 + 4 AS INTEGER) AS height,
      |  CAST((doc_id % 16 + 4) * (doc_id % 12 + 4) AS BIGINT) AS n_px,
      |  ROUND(CAST(list_sum(list_transform(range((doc_id%16+4)*(doc_id%12+4)), i -> (doc_id*31 + i*7) % 256)) AS DOUBLE)
      |    / ((doc_id%16+4)*(doc_id%12+4)), 6) AS mean_r,
      |  ROUND(CAST(list_sum(list_transform(range((doc_id%16+4)*(doc_id%12+4)), i -> (doc_id*17 + i*13) % 256)) AS DOUBLE)
      |    / ((doc_id%16+4)*(doc_id%12+4)), 6) AS mean_g,
      |  ROUND(CAST(list_sum(list_transform(range((doc_id%16+4)*(doc_id%12+4)), i -> (doc_id*29 + i*3) % 256)) AS DOUBLE)
      |    / ((doc_id%16+4)*(doc_id%12+4)), 6) AS mean_b,
      |  CAST(list_max(list_transform(range((doc_id%16+4)*(doc_id%12+4)),
      |    i -> (77*((doc_id*31 + i*7) % 256) + 150*((doc_id*17 + i*13) % 256) + 29*((doc_id*29 + i*3) % 256)) // 256)) AS INTEGER) AS max_luma,
      |  CAST(list_min(list_transform(range((doc_id%16+4)*(doc_id%12+4)),
      |    i -> (77*((doc_id*31 + i*7) % 256) + 150*((doc_id*17 + i*13) % 256) + 29*((doc_id*29 + i*3) % 256)) // 256)) AS INTEGER) AS min_luma
      |FROM documents""".stripMargin

  // --------------------------------------------------------------------------
  // q_multimodal_features — end-to-end: media table → batched decode+extract.
  // Oracle-checkable because the corpus is ASCII: utf-8 byte stats equal
  // char-code stats, which DuckDB can compute with list lambdas.
  // --------------------------------------------------------------------------
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    extractFeatures(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        round(col("mean_byte"), 6).as("mean_byte"), col("max_byte"), col("min_byte"))
  }

  val multimodalFeaturesSql: String =
    """SELECT doc_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
      |  CAST(LENGTH(text) AS BIGINT) AS n_bytes,
      |  ROUND(CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS DOUBLE)
      |    / LENGTH(text), 6) AS mean_byte,
      |  CAST(list_max(list_transform(string_split(text, ''), c -> ascii(c))) AS INTEGER) AS max_byte,
      |  CAST(list_min(list_transform(string_split(text, ''), c -> ascii(c))) AS INTEGER) AS min_byte
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> (multimodalFeatures _),
    "q_image_features"      -> (imageFeaturesQuery _),
    "q_image_neardup"       -> (ImageHash.imageNearDup _),
    "q_audio_neardup"       -> (AudioHash.audioNearDup _),
    "q_video_neardup"       -> (VideoHash.videoNearDup _),
    "q_video_frames"        -> (videoFramesQuery _),
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_features" -> multimodalFeaturesSql,
    "q_image_features"      -> imageFeaturesSql,
    "q_image_neardup"       -> ImageHash.imageNearDupSql,
    "q_audio_neardup"       -> AudioHash.audioNearDupSql,
    "q_video_neardup"       -> VideoHash.videoNearDupSql,
    "q_video_frames"        -> videoFramesSql,
  )
}
