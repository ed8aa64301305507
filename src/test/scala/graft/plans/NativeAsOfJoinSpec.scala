package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.AsOfJoin
import graft.sources.Tables

class NativeAsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of matches the window-based formulation on hand data") {
    val left = Seq((1L, 100L, "p1"), (1L, 205L, "p2"), (1L, 205L, "p2b"),
      (2L, 50L, "p3"), (3L, 10L, "p4")).toDF("k", "t", "name")
    val right = Seq((1L, 100L, "s1"), (1L, 200L, "s2"), (1L, 300L, "s3"),
      (2L, 60L, "s4"), (4L, 1L, "s5")).toDF("k", "t", "sid")
    val native = NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t",
        Map("sid" -> "m")).select("name", "m")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(native == Map("p1" -> "s1", "p2" -> "s2", "p2b" -> "s2",
      "p3" -> null, "p4" -> null))
  }

  test("native as-of equals composed as-of on the full events table") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("sid"))
    val a = NativeAsOfJoin.backward(purchases, signups,
        Seq("user_id"), "ts", "ts", Map("sid" -> "signup_event_id"))
      .select("event_id", "signup_event_id")
    val b = AsOfJoin.backward(purchases, signups,
        Seq("user_id"), "ts", "ts", Map("sid" -> "signup_event_id"))
      .select("event_id", "signup_event_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("as-of payload rides as one row: null fields are NOT backfilled from older rows") {
    // most recent right row (t=200) has a null in one payload column; the
    // output must carry THAT row's (null, b2) — not mix s1's a-value in
    val left = Seq((1L, 300L, "p1")).toDF("k", "t", "name")
    val right = Seq(
      (1L, 100L, Some("a1"), Some("b1")),
      (1L, 200L, None: Option[String], Some("b2"))).toDF("k", "t", "a", "b")
    for (out <- Seq(
        AsOfJoin.backward(left, right, Seq("k"), "t", "t", Map("a" -> "ma", "b" -> "mb")),
        NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t", Map("a" -> "ma", "b" -> "mb")))) {
      val r = out.select("ma", "mb").collect().head
      assert(r.isNullAt(0) && r.getString(1) == "b2", r.toString)
    }
  }

  test("as-of null keys and null times never match, on both formulations") {
    val left = Seq((Some(1L), 100L, "p1"), (None: Option[Long], 100L, "pnull"))
      .toDF("k", "t", "name")
    val right = Seq(
      (Some(1L), Some(50L), "ok"),
      (Some(1L), None: Option[Long], "null_time"),   // never a match
      (None: Option[Long], Some(40L), "null_key"))   // never a match
      .toDF("k", "t", "sid")
    for (out <- Seq(
        AsOfJoin.backward(left, right, Seq("k"), "t", "t", Map("sid" -> "m")),
        NativeAsOfJoin.backward(left, right, Seq("k"), "t", "t", Map("sid" -> "m")))) {
      val m = out.select("name", "m").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(m == Map("p1" -> "ok", "pnull" -> null), m.toString)
    }
  }

  test("physical plan is the custom exec with one exchange+sort per side") {
    val ev = Tables.events(spark, sf0001)
    val df = NativeAsOfJoin.backward(
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts")),
      ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("sid")),
      Seq("user_id"), "ts", "ts", Map("sid" -> "signup_event_id"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p)   // SparkPlan nodeName strips "Exec"
    assert(p.split("Exchange hashpartitioning").length - 1 == 2, p)
  }
}
