package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Runtime complement to Salting's MANUAL skew mitigation and
  * PlanAuditSpec's static plan checks: prove that AQE's skew-join split —
  * the mechanism a 100 TB join actually relies on when a power-law key
  * lands — really triggers in this engine configuration, splitting the
  * oversized partition instead of funneling it through one task. */
class AqeSkewSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a planted power-law key at runtime (skew=true in the final plan)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the skew detector down to test-data sizes: a partition is
      // skewed when > factor × median AND > threshold bytes
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // force the shuffle join path — a broadcast join has no skew to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // keep AQE from pre-coalescing everything into one partition
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB") {
      // power-law: 95% of left rows share key 0; right has two rows per key
      // (broadcast is disabled above, so the join still shuffles — and the
      // hot key's output stays linear, not quadratic)
      val left = spark.range(0, 200000).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 64).as("k"),
        concat(lit("left-payload-"), col("id")).as("lv"))
      val right = spark.range(0, 128).select(
        (col("id") % 64).as("k"),
        concat(lit("right-payload-"), col("id")).as("rv"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (an action like .count() would build its
      // own): AQE decides skew handling from runtime shuffle stats, so the
      // final plan exists only after the plan itself has run
      val n = joined.queryExecution.toRdd.count()
      assert(n > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split did not trigger on a 95%-hot key:\n$finalPlan")
      // and the result is the same as the no-AQE join (the split is pure
      // execution strategy, invisible in the data)
      val plainCount = withConf("spark.sql.adaptive.enabled" -> "false") {
        left.join(right, "k").count()
      }
      assert(n == plainCount)
    }
  }
}
