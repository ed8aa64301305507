package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Dataset

/** Object-store stand-in for multimodal POINTER mode.
  *
  * At 100 TB the binary media column does not hold payloads — it holds
  * object-store URIs, and the decode pipeline fetches bytes next to the
  * compute (the contract sketched in [[Multimodal]]'s scale notes). This
  * implements that mode against any Hadoop FileSystem (file:// locally,
  * s3a/abfs/gs on a cluster — same API):
  *
  *  - [[put]] uploads each row's payload as one object, FROM THE EXECUTORS
  *    (a narrow mapPartitions; the driver never sees a byte), and returns
  *    the pointer table (doc_id, uri, n_bytes).
  *  - [[fetch]] streams pointer partitions in fixed-size batches, opening
  *    the filesystem once per partition and fetching each batch's objects
  *    before yielding it — the same batch shape the payload-mode feature
  *    extractors use, so a decode stage composes identically with either
  *    mode (MultimodalSpec asserts pointer == payload features end-to-end).
  *
  * Object keys fan out over 256 prefixes (`p=<doc_id % 256>/<doc_id>.bin`):
  * one flat million-object "directory" is exactly what object-store listing
  * and HDFS namenodes fall over on.
  */
object MediaStore {

  final case class ObjectPtr(doc_id: Long, uri: String, n_bytes: Long)

  /** Hadoop conf isn't serializable; ship its entries (public API only) so
    * executor-side filesystem access sees session settings (credentials
    * etc.) — same approach as DataSkipping.collect. */
  private def confMap(ds: Dataset[_]): Map[String, String] = {
    val conf = ds.sparkSession.sessionState.newHadoopConf()
    val it = conf.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  private def fsFor(uri: java.net.URI, entries: Map[String, String]) = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    org.apache.hadoop.fs.FileSystem.get(uri, c)
  }

  private def key(storeDir: String, docId: Long): String =
    s"$storeDir/p=${docId % 256}/$docId.bin"

  /** Upload payloads (one object per row) from the executors; returns the
    * pointer table. Overwrites existing objects (idempotent re-runs). */
  def put(payloads: Dataset[(Long, Array[Byte])], storeDir: String): Dataset[ObjectPtr] = {
    import payloads.sparkSession.implicits._
    val entries = confMap(payloads)
    val root = new Path(storeDir).toUri
    payloads.mapPartitions { rows =>
      val fs = fsFor(root, entries)
      rows.map { case (id, bytes) =>
        val p = new Path(key(storeDir, id))
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
        ObjectPtr(id, p.toString, bytes.length.toLong)
      }
    }
  }

  /** Batched executor-side fetch: resolve each batch of pointers to payload
    * bytes. Narrow, no shuffle. `n_bytes` from the pointer row sizes the
    * read buffer; one metadata stat per object cross-checks it so a stale
    * pointer (object rewritten since `put`) fails loudly instead of
    * returning silently truncated bytes. */
  def fetch(ptrs: Dataset[ObjectPtr], batchSize: Int = 64): Dataset[(Long, Array[Byte])] = {
    import ptrs.sparkSession.implicits._
    val entries = confMap(ptrs)
    ptrs.mapPartitions { rows =>
      var fs: org.apache.hadoop.fs.FileSystem = null
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { ptr =>
          val p = new Path(ptr.uri)
          if (fs == null) fs = fsFor(p.toUri, entries)
          // JVM arrays are Int-indexed: a >=2 GiB pointer would overflow
          // toInt into a negative size — fail loudly, don't corrupt
          require(ptr.n_bytes >= 0 && ptr.n_bytes <= Int.MaxValue,
            s"object ${ptr.uri}: size ${ptr.n_bytes} exceeds the 2 GiB " +
              "single-buffer fetch limit (chunk the object or stream it)")
          // a stale pointer (object overwritten larger since `put`) must not
          // silently truncate: verify the live object length first
          val live = fs.getFileStatus(p).getLen
          require(live == ptr.n_bytes,
            s"object ${ptr.uri}: pointer says ${ptr.n_bytes} bytes but store " +
              s"holds $live — pointer is stale; re-resolve before fetching")
          val buf = new Array[Byte](ptr.n_bytes.toInt)
          val in = fs.open(p)
          try in.readFully(buf) finally in.close()
          ptr.doc_id -> buf
        }
      }
    }
  }
}
