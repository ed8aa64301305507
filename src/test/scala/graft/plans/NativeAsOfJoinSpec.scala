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
