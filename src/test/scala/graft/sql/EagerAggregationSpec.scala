package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedTable

/** Eager aggregation: the star aggregate's fact side pre-aggregates on
  * the join keys when NDV sketches prove the rollup collapses it —
  * exactly once (fixpoint-safe), value-identical to the plain shape, and
  * declining every shape whose re-aggregation is not exact. */
class EagerAggregationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("eager").toString

  /** Number of Aggregate nodes below a Join in the optimized plan. */
  private def partialAggs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case Join(l, r, _, _, _) =>
        Seq(l, r).count(_.exists(_.isInstanceOf[Aggregate]))
    }.sum

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertEager(q: => DataFrame): Unit = {
    val on = q
    assert(partialAggs(on) == 1,
      s"expected one partial aggregate below the join:\n" +
        on.queryExecution.optimizedPlan)
    spark.conf.set("spark.graft.eagerAgg.enabled", "false")
    try {
      val off = q
      assert(partialAggs(off) == 0, "kill-switch ignored")
      assert(sorted(on) == sorted(off), "eager aggregation changed values")
    } finally spark.conf.set("spark.graft.eagerAgg.enabled", "true")
  }

  test("star aggregate pre-aggregates on the join key; exact; declines unsound shapes") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      (1L to 2000L).map(i => (i, i % 20, i, i / 7.0))
        .toDF("id", "fk", "v", "f"),
      fact, statsCols = Seq("id"))
    VersionedTable.write(
      (0L to 19L).map(k => (k, "g" + k % 4)).toDF("pk", "g"), dim,
      statsCols = Seq("pk"))
    VersionedTable.analyzeNdv(spark, fact, Seq("fk"))
    def f = VersionedTable.read(spark, fact)
    def d = VersionedTable.read(spark, dim)
    assertEager(f.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"),
        min($"v").as("mn"), max($"v").as("mx"), count($"v").as("nn")))
    // fact-side group column joins the partial keys
    assertEager(f.join(d, $"fk" === $"pk").groupBy($"g", $"fk")
      .agg(count(lit(1)).as("n"), sum($"v").as("s")))
    // a fact-side filter rides below the partial
    assertEager(f.filter($"v" > 100L).join(d, $"fk" === $"pk")
      .groupBy($"g").agg(sum($"v").as("s")))
    // LEFT join with the fact on the LEFT: unmatched fact rows surface
    // the same null-dim group either way — fires and stays exact
    // (fact rows with fk ∈ 0..19 all match here, so ALSO check a dim
    // subset that leaves some unmatched)
    assertEager(f.join(d.filter($"pk" < 10L), $"fk" === $"pk", "left")
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"),
        count($"v").as("nn"), min($"v").as("mn")))
    // fact on the RIGHT of a left join declines (COUNT(*) counts
    // unmatched dim rows a null partial would skip)
    def declinesQ(q: DataFrame): Unit =
      assert(partialAggs(q) == 0, q.queryExecution.optimizedPlan.toString)
    declinesQ(d.join(f, $"fk" === $"pk", "left")
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s")))
    // declines: fractional SUM, DISTINCT, global aggregate, un-sketched
    def declines(q: DataFrame): Unit =
      assert(partialAggs(q) == 0, q.queryExecution.optimizedPlan.toString)
    declines(f.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(sum($"f").as("s")))
    declines(f.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(countDistinct($"v").as("n")))
    declines(f.join(d, $"fk" === $"pk").groupBy()
      .agg(sum($"v").as("s")))
    val bare = base + "/bare"
    VersionedTable.write(
      (1L to 100L).map(i => (i, i % 5, i)).toDF("id", "fk", "v"), bare)
    declines(VersionedTable.read(spark, bare).join(d, $"fk" === $"pk")
      .groupBy($"g").agg(sum($"v").as("s")))
    // the COST GATE declines when the sketch says the key barely collapses
    spark.conf.set("spark.graft.eagerAgg.maxKeyRatio", "0.001")
    try declines(f.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(sum($"v").as("s")))
    finally spark.conf.unset("spark.graft.eagerAgg.maxKeyRatio")
  }
}
