package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.MinHashSketchAgg
import graft.operators.NearDup
import graft.sources.Tables

class PushdownRuleSpec extends SparkSpec {

  test("left-only filter above native as-of reaches the parquet scan") {
    val ev = Tables.events(spark, sf0001)
    val joined = NativeAsOfJoin.backward(
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value")),
      ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("sid")),
      Seq("user_id"), "ts", "ts", Map("sid" -> "signup_event_id"))
    val filtered = joined.filter(col("value") > 100.0)

    val optimized = filtered.queryExecution.optimizedPlan.toString
    // the filter must sit BELOW the as-of node (pushed into the left child)
    assert(optimized.indexOf("AsOfJoinPlan") < optimized.indexOf("100.0"), optimized)
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThan(value,100.0)"), physical) // in PushedFilters

    // and semantics are unchanged vs filtering before the join
    val pre = NativeAsOfJoin.backward(
      ev.filter(col("event_type") === "purchase" && col("value") > 100.0)
        .select(col("event_id"), col("user_id"), col("ts"), col("value")),
      ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("sid")),
      Seq("user_id"), "ts", "ts", Map("sid" -> "signup_event_id"))
    assert(filtered.exceptAll(pre).isEmpty && pre.exceptAll(filtered).isEmpty)
  }
}

class MinHashSketchAggSpec extends SparkSpec {
  import spark.implicits._

  test("sketch aggregate equals the expression formulation, and merges") {
    val docs = Seq((1L, "a b c d e f"), (2L, "x y z w v u"), (3L, "a b c d e f"))
      .toDF("doc_id", "text")
    val sh = NearDup.shingles(docs)
    // force many partitions so partial buffers MUST merge
    val sketch = sh.repartition(16)
      .groupBy(col("doc_id"))
      .agg(MinHashSketchAgg(col("shingle"), NearDup.NumHashes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exprForm = sh
      .groupBy(col("doc_id"))
      .agg(concat_ws("|", (0 until NearDup.NumHashes).map(i =>
        min(md5(concat(col("shingle"), lit(s"#$i"))))): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sketch == exprForm)
    assert(sketch(1L) == sketch(3L))   // identical docs → identical sketch
    assert(sketch(1L) != sketch(2L))
    assert(sketch(1L).split('|').length == NearDup.NumHashes)
  }
}

class KmvSketchAggSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.KmvSketchAgg

  private def estimate(n: Int, k: Int, parts: Int): Long =
    (1 to n).map(i => s"v$i").toDF("v").repartition(parts)
      .agg(KmvSketchAgg(col("v"), k).as("e")).head().getLong(0)

  test("under k the sketch is exact, duplicates collapse") {
    val dup = ((1 to 50) ++ (1 to 50)).map(i => s"v$i").toDF("v")
    assert(dup.agg(KmvSketchAgg(col("v"), 1024).as("e")).head().getLong(0) == 50L)
  }

  test("estimate is partition-invariant (partial merges change nothing)") {
    val a = estimate(5000, 256, 1)
    val b = estimate(5000, 256, 32)
    assert(a == b, s"$a vs $b")
  }

  test("estimate lands within the sketch's expected error band") {
    // KMV relative std error ≈ 1/sqrt(k-2); allow 4 sigma
    val k = 256
    val n = 5000
    val e = estimate(n, k, 8)
    val tol = 4.0 / math.sqrt(k - 2.0) * n
    assert(math.abs(e - n) <= tol, s"estimate $e vs true $n (tol $tol)")
  }

  test("nulls are ignored; all-null input estimates zero") {
    val df = Seq[Option[String]](None, None, Some("a"), Some("b")).toDF("v")
    assert(df.agg(KmvSketchAgg(col("v"), 16).as("e")).head().getLong(0) == 2L)
    assert(Seq[Option[String]](None).toDF("v")
      .agg(KmvSketchAgg(col("v"), 16).as("e")).head().getLong(0) == 0L)
  }
}
