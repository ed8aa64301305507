package graft
import org.apache.spark.sql.SparkSession
import graft.operators.NearDup
import graft.sources.Tables

/** Dev scratchpad: piecewise stage timings for the minhash pipeline. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.storage.memoryMapThreshold", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (_ <- 1 to 2) {
      val docs = Tables.documents(spark, sfDir)
      val sh = NearDup.shingles(docs)
      time("shingles.count")(println(sh.count()))
      val sig = NearDup.signatures(sh)
      time("signatures.count")(println(sig.count()))
      val bands = NearDup.bandKeys(sig)
      time("bands.count")(println(bands.count()))
      val cand = NearDup.lshCandidates(bands)
      time("cand.count")(println(cand.count()))
      time("full")(NearDup.minhashLsh(spark, sfDir).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
