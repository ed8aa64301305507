package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line.
  *
  * Methodology: an untimed warmup pass at sf0.001 first, so JIT/whole-stage
  * codegen/classloading cost is not attributed to the first measured query
  * (cold-JVM skew put 19s on whichever query happened to run first).
  * Measured runs write to the `noop` sink — unlike `.count()`, that
  * materializes every projected column, so expression work can't be pruned
  * away from the measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.storage.memoryMapThreshold", "2g")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Unit = {
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      // queries may cache intermediates (e.g. shingle sets); drop them so one
      // query's working set can't GC-pressure the next measurement
      spark.catalog.clearCache()
    }

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    // JIT/codegen warmup on the tiny SF, then one untimed pass at the target
    // SF so the measured pass reports steady-state engine throughput rather
    // than first-touch page-cache misses on whichever query runs first.
    qs.foreach { case (_, fn) =>
      try run(fn, warmDir) catch { case _: Throwable => () }
    }
    qs.foreach { case (_, fn) =>
      try run(fn, sfDir) catch { case _: Throwable => () }
    }
    // let the JIT compile queue drain: ~80 warmup query executions enqueue
    // thousands of C2 tasks; measuring into that backlog times tier-1 code
    Thread.sleep(20000)
    // three interleaved timed passes, per-query minimum: JIT-deopt storms on
    // this VM degrade arbitrary 1-2 minute windows; a window covers one
    // pass's execution of a query but rarely all three, so min-of-3 reports
    // steady-state engine throughput instead of which pass got unlucky.
    // A crashing query records -1 (never a misleading partial duration) and
    // bumps the failure count in the output line.
    def timedPass(): Map[String, Double] = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        run(fn, sfDir)
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        name -> -1.0
      }
    }.toMap
    val nPasses = 3
    val passes = Seq.fill(nPasses)(timedPass())
    val results = qs.map { case (name, _) =>
      val ts = passes.map(_(name)).filter(_ >= 0)
      name -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    // per-query relative spread (max-min)/min across the passes, median over
    // queries: quantifies this VM's JIT/scheduler jitter directly in the
    // artifact, so round-over-round deltas smaller than the recorded jitter
    // are read as noise, not regressions
    val spreads = qs.flatMap { case (name, _) =>
      val ts = passes.map(_(name)).filter(_ >= 0)
      if (ts.size == nPasses && ts.min > 0) Some((ts.max - ts.min) / ts.min) else None
    }.sorted
    val jitterMedPct =
      if (spreads.isEmpty) -1.0 else math.round(spreads(spreads.size / 2) * 1000) / 10.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"n":$nPasses,"stat":"per_query_min_of_$nPasses","jitter_med_pct":$jitterMedPct,"queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
