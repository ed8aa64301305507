package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the `_metadata.file_path` format contract every file-key join
  * depends on: scheme + ':' [+ '//' authority] + the URI-RAW
  * (percent-encoded) path — NOT `Path.toString` (decoded) and NOT
  * `toUri.toString` (renders empty authority as '//'). If a Spark upgrade
  * changes the producer, THIS test names the break instead of partition
  * values silently nulling in copy-on-write rewrites. */
class MetaKeySpec extends SparkSpec {
  import spark.implicits._

  test("driver-side key reconstruction equals _metadata.file_path, special chars included") {
    val dir = java.nio.file.Files.createTempDirectory("metakey").toString
    // space (uri-encoded), colon (NOT encoded in a uri path), plus (kept)
    Seq((1L, "x")).toDF("id", "s").coalesce(1)
      .write.parquet(s"$dir/dt=a b:c+d/h=0")
    val observed = spark.read.parquet(dir)
      .select(col("_metadata.file_path")).head.getString(0)
    val root = new org.apache.hadoop.fs.Path(dir)
    val rel = {
      val f = root.getFileSystem(spark.sessionState.newHadoopConf())
      val rootUri = f.getFileStatus(root).getPath.toUri
      val it = f.listFiles(root, true)
      var found: Option[String] = None
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          found = Some(rootUri.relativize(st.getPath.toUri).getPath)
      }
      found.get
    }
    import org.apache.spark.sql.graft.GraftBatchShim
    val rebuilt = GraftBatchShim.rootAbsOf(spark, root) + GraftBatchShim.encRel(rel)
    assert(rebuilt == observed, s"rebuilt=$rebuilt observed=$observed")
    // the decoded-space prefix strips back to the raw manifest rel
    val decPrefix = GraftBatchShim.rootPathOf(spark, root)
    val decFull = new org.apache.hadoop.fs.Path(
      new java.net.URI(observed)).toUri.getPath
    assert(decFull.startsWith(decPrefix) &&
      decFull.substring(decPrefix.length) == rel,
      s"dec=$decFull prefix=$decPrefix rel=$rel")
  }
}
