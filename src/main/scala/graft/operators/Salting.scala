package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A straight `groupBy(hotKey)` funnels every row of a hot key through one
  * reducer; at 100 TB a handful of hot keys stall the stage. Salting splits
  * each key into `buckets` sub-groups aggregated in parallel (phase 1:
  * map-side-combinable, evenly spread), then merges the partial aggregates
  * (phase 2: tiny — at most keys × buckets rows cross the second shuffle).
  *
  * The salt must be deterministic per row (hash of a unique column), not
  * random — retries/speculative tasks must land rows in the same bucket.
  */
object Salting {

  /** count + sum aggregation over a (possibly skewed) key. */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      sumCol: Column,
      uniqueCol: Column,
      buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(uniqueCol), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(sumCol).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as("sum_value"))
}
