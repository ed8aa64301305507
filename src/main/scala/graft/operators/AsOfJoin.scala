package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Backward as-of join: for each left row, attach the payload of the most
  * recent right row with the same key and `rightTime <= leftTime`.
  *
  * Spark has no as-of join operator; rather than a range-join (which explodes
  * to a theta-join at scale) this uses the union + ordered-window formulation:
  * union both sides, sort within each key partition by (time, side), and carry
  * the latest right payload forward with last(_, ignoreNulls=true). That is a
  * SINGLE shuffle on the key — the same cost as one sort-merge join — and
  * never materializes candidate pairs, so it survives 100 TB inputs where a
  * time-range theta join would not. Ties (equal truncated timestamps) resolve
  * right-row-first, matching ASOF semantics with a `>=` bound.
  *
  * The payload is carried as ONE struct column filled with a single
  * last(_, ignoreNulls=true): the struct of the most recent right row is
  * non-null even when its fields are null, so null payload fields ride along
  * with their row. Filling each payload column independently would instead
  * substitute an older row's value for a null field and could mix fields
  * from different right rows — not as-of semantics.
  */
object AsOfJoin {

  /** @param rightPayload right-side columns to carry onto left rows (renamed
    *                     as given); all other right columns are dropped. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Map[String, String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val payloadAliases = rightPayload.values.toSeq

    // Right side: keep keys + time + payload, mark side=0 (sorts before left
    // rows at equal time → inclusive `>=` as-of bound). SQL join semantics:
    // right rows with a null key or null time can never match (and a
    // null-keyed left row then finds nothing in its partition) — same
    // contract as the native operator's merge.
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")) ++
        rightPayload.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
      .filter((keys.map(col(_).isNotNull) :+ col("__t").isNotNull).reduce(_ && _))
      .withColumn("__side", lit(0))

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // one struct per right row: non-null wrapper even when fields are null
    val rAligned = r.select(
      (keys.map(col) :+ col("__t") :+ col("__side") :+
        struct(payloadAliases.map(col): _*).as("__p")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(s"__l_$c")): _*)
    val pType = rAligned.schema("__p").dataType
    val lAligned = l.select(
      (keys.map(col) :+ col("__t") :+ col("__side") :+
        lit(null).cast(pType).as("__p")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lAligned.unionByName(rAligned)
      .select(
        (keys.map(col) ++
          leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) :+
          last(col("__p"), ignoreNulls = true).over(w).as("__p") :+
          col("__side")): _*)

    filled.filter(col("__side") === 1)
      .select(
        (keys.map(col) ++
          leftCols.filterNot(keys.contains).map(col) ++
          payloadAliases.map(a => col("__p").getField(a).as(a))): _*)
  }

  /** q_asof_join — each purchase event paired with the user's most recent
    * prior-or-simultaneous signup event (DuckDB oracle uses its native
    * ASOF LEFT JOIN).
    */
  def purchaseAsofSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("sid"))
    backward(purchases, signups, Seq("user_id"), "ts", "ts",
        Map("sid" -> "signup_event_id"))
      .select(
        col("event_id"), col("user_id"),
        to_date(col("ts")).as("p_date"),
        col("signup_event_id"))
  }

  val purchaseAsofSignupSql: String =
    """SELECT p.event_id AS event_id, p.user_id AS user_id,
      |  CAST(p.ts AS DATE) AS p_date,
      |  s.event_id AS signup_event_id
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin
}
