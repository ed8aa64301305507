package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Event-time sessionization: split each key's ordered event stream into
  * sessions wherever the inter-event gap exceeds a threshold, then aggregate
  * per session. Classic gaps-and-islands: lag → boundary flag → running sum.
  * One shuffle on the key; both windows share the same partitioning so
  * Catalyst plans a single exchange + sort.
  */
object Sessionize {

  def sessions(events: DataFrame, key: String, timeCol: String,
      gapSeconds: Long, tiebreak: String): DataFrame = {
    val order = Seq(col(timeCol).asc, col(tiebreak).asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__us", unix_micros(col(timeCol)))
      .withColumn("__prev_us", lag(col("__us"), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_us").isNull ||
          col("__us") - col("__prev_us") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new_session")).over(wRun))
      .drop("__us", "__prev_us", "__new_session")
  }

  /** q_sessionize — 30-minute-gap sessions over the events stream, one row
    * per (user, session): size, span, bounds.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    sessions(Tables.events(spark, dir), "user_id", "ts", 1800L, "event_id")
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_us"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"))

  val sessionStatsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |      OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      |sess AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS span_us,
      |  MIN(event_id) AS first_event_id,
      |  MAX(event_id) AS last_event_id
      |FROM sess GROUP BY user_id, session_id""".stripMargin
}
