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

  /** Number of Aggregate nodes below the TOP join in the optimized plan
    * (counting per-join would double-count a partial sitting under two
    * stacked joins of a multi-join star). */
  private def partialAggs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collectFirst { case j: Join => j }
      .map(j => Seq(j.left, j.right)
        .map(_.collect { case a: Aggregate => a }.size).sum)
      .getOrElse(0)

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

  test("decimal SUM and AVG decompose exactly; double AVG declines") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      (1L to 2000L).map(i => (i, i % 20, BigDecimal(i) / 100, i, i / 7.0))
        .toDF("id", "fk", "dec", "v", "f")
        .select($"id", $"fk", $"dec".cast("decimal(12,2)").as("dec"),
          $"v", $"f"),
      fact, statsCols = Seq("id"))
    VersionedTable.write(
      (0L to 19L).map(k => (k, "g" + k % 4)).toDF("pk", "g"), dim,
      statsCols = Seq("pk"))
    VersionedTable.analyzeNdv(spark, fact, Seq("fk"))
    def f = VersionedTable.read(spark, fact)
    def d = VersionedTable.read(spark, dim)
    // decimal SUM: partial sums re-associate exactly; output type preserved
    assertEager(f.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(sum($"dec").as("s"), count(lit(1)).as("n")))
    // AVG at decimal and long inputs (rule-off value equality included in
    // assertEager — which needs a FRESH frame per evaluation, the plan is
    // lazily cached per DataFrame); output types must survive the
    // recombination
    def avgQ = f.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(avg($"dec").as("a_dec"), avg($"v").as("a_long"),
        sum($"dec").as("s"), count(lit(1)).as("n"))
    assert(avgQ.schema("a_dec").dataType ==
      org.apache.spark.sql.types.DecimalType(16, 6))
    assert(avgQ.schema("a_long").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assertEager(avgQ)
    // AVG through a LEFT join with unmatched fact rows stays exact
    assertEager(f.join(d.filter($"pk" < 10L), $"fk" === $"pk", "left")
      .groupBy($"g").agg(avg($"dec").as("a"), avg($"v").as("a2"),
        count(lit(1)).as("n")))
    // nulls: a decimal column that is NULL for some rows — AVG counts
    // only non-null contributions, SUM skips them
    val nfact = base + "/nfact"
    VersionedTable.write(
      (1L to 400L).map(i => (i, i % 10,
        if (i % 3 == 0) null else (BigDecimal(i) / 10).bigDecimal))
        .toDF("id", "fk", "dec")
        .select($"id", $"fk", $"dec".cast("decimal(12,2)").as("dec")),
      nfact, statsCols = Seq("id"))
    VersionedTable.analyzeNdv(spark, nfact, Seq("fk"))
    assertEager(VersionedTable.read(spark, nfact)
      .join(d, $"fk" === $"pk").groupBy($"g")
      .agg(avg($"dec").as("a"), sum($"dec").as("s"),
        count($"dec").as("nn"), count(lit(1)).as("n")))
    // double AVG declines (re-association is not bit-exact)
    def declines(q: org.apache.spark.sql.DataFrame): Unit =
      assert(partialAggs(q) == 0, q.queryExecution.optimizedPlan.toString)
    declines(f.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(avg($"f").as("a")))
  }

  test("un-sketched gates: FK pin bounds a key, a covering view bounds the tuple; RIGHT joins and semi arms") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      (1L to 2000L).map(i => (i, i % 20, i)).toDF("id", "fk", "v"),
      fact, statsCols = Seq("id"))
    VersionedTable.write(
      (0L to 19L).map(k => (k, "g" + k % 4)).toDF("pk", "g"), dim,
      statsCols = Seq("pk"))
    def f = VersionedTable.read(spark, fact)
    def d = VersionedTable.read(spark, dim)
    def declines(q: DataFrame): Unit =
      assert(partialAggs(q) == 0, q.queryExecution.optimizedPlan.toString)
    // no sketch, no pin, no view: declines (no proven bound)
    declines(f.join(d, $"fk" === $"pk").groupBy($"g").agg(sum($"v").as("s")))
    // a validated FK pin at this snapshot bounds ndv(fk) ≤ dim rows + 1
    graft.sources.ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    assertEager(f.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s")))
    // the pin is snapshot-anchored: fact motion disarms until re-declared
    VersionedTable.append(Seq((9001L, 3L, 5L)).toDF("id", "fk", "v"), fact)
    declines(f.join(d, $"fk" === $"pk").groupBy($"g").agg(sum($"v").as("s")))
    graft.sources.ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    assertEager(f.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s")))
    // RIGHT join — dim RIGHT JOIN fact, fact on the PRESERVED side: fires
    // (a dim subset leaves fact rows unmatched — the null group must agree)
    assertEager(d.filter($"pk" < 10L).join(f, $"fk" === $"pk", "right")
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"),
        count($"v").as("nn")))
    // fact on the null-producing side of a RIGHT join declines
    declines(f.join(d, $"fk" === $"pk", "right")
      .groupBy($"g").agg(sum($"v").as("s")))
    // the fact ARM may be a LeftSemi join (it only filters fact rows):
    // the partial plants above the semi, below the dim join
    val sd = base + "/semidim"
    VersionedTable.write((0L to 9L).map(k => (k, k)).toDF("sk", "x"), sd)
    assertEager(f.join(VersionedTable.read(spark, sd), $"fk" === $"sk",
        "left_semi")
      .join(d, $"fk" === $"pk")
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s")))
    // covering-view tuple bound: un-sketched, un-pinned fact whose
    // registered view groups by a SUPERSET of the partial keys at the
    // same watermark — the view's group count bounds the tuple. The view
    // carries no MIN, so the MIN in the query keeps the partial itself
    // from being answered by the view rewrite (pure gate test).
    val fact2 = base + "/fact2"; val mv = base + "/mv"
    VersionedTable.write(
      (1L to 1000L).map(i => (i, i % 10, i % 5, i))
        .toDF("id", "fk", "fk2", "v"), fact2, statsCols = Seq("id"))
    def f2 = VersionedTable.read(spark, fact2)
    declines(f2.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(sum($"v").as("s"), min($"v").as("mn")))
    graft.sources.MaterializedView.create(spark, fact2, mv,
      Seq("fk", "fk2"), Seq("v"))
    assertEager(f2.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"), min($"v").as("mn")))
    // view watermark must equal the snapshot: fact2 motion disarms the
    // bound until the view refreshes
    VersionedTable.append(Seq((5001L, 3L, 3L, 9L))
      .toDF("id", "fk", "fk2", "v"), fact2)
    declines(f2.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(sum($"v").as("s"), min($"v").as("mn")))
    graft.sources.MaterializedView.refresh(spark, mv)
    assertEager(f2.join(d, $"fk" === $"pk").groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"), min($"v").as("mn")))
  }

  test("multi-join star pre-aggregates the fact below BOTH joins") {
    val base = tmp(); val fact = base + "/fact"
    val d1 = base + "/d1"; val d2 = base + "/d2"
    VersionedTable.write(
      (1L to 2000L).map(i =>
        (i, i % 20, i % 7, i, BigDecimal(i) / 100))
        .toDF("id", "fk1", "fk2", "v", "dec")
        .select($"id", $"fk1", $"fk2", $"v",
          $"dec".cast("decimal(12,2)").as("dec")),
      fact, statsCols = Seq("id"))
    VersionedTable.write(
      (0L to 19L).map(k => (k, "a" + k % 4)).toDF("pk1", "g1"), d1)
    VersionedTable.write(
      (0L to 6L).map(k => (k, "b" + k % 3)).toDF("pk2", "g2"), d2)
    VersionedTable.analyzeNdv(spark, fact, Seq("fk1", "fk2"))
    def f = VersionedTable.read(spark, fact)
    def dd1 = VersionedTable.read(spark, d1)
    def dd2 = VersionedTable.read(spark, d2)
    // the partial must land BELOW the innermost (fact) join: exactly one
    // Aggregate under the LOWEST join in the optimized plan
    def lowestJoinHasPartial(df: org.apache.spark.sql.DataFrame): Boolean = {
      val joins = df.queryExecution.optimizedPlan.collect {
        case j: Join => j }
      val lowest = joins.last // collect is pre-order; last is innermost
      Seq(lowest.left, lowest.right)
        .exists(_.exists(_.isInstanceOf[Aggregate]))
    }
    def q = f.join(dd1, $"fk1" === $"pk1").join(dd2, $"fk2" === $"pk2")
      .groupBy($"g1", $"g2")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"),
        sum($"dec").as("sd"), avg($"v").as("a"), min($"v").as("mn"))
    assertEager(q)
    val qq = q
    assert(lowestJoinHasPartial(qq),
      s"partial not below the lowest join:\n${qq.queryExecution.optimizedPlan}")
    // mixed group: fact-side group column joins the partial keys while
    // dim groups ride above
    assertEager(f.join(dd1, $"fk1" === $"pk1").join(dd2, $"fk2" === $"pk2")
      .groupBy($"g1", $"fk2").agg(sum($"v").as("s")))
    // LEFT joins along the path with the fact on the left: exact
    assertEager(f.join(dd1.filter($"pk1" < 10L), $"fk1" === $"pk1", "left")
      .join(dd2, $"fk2" === $"pk2")
      .groupBy($"g1", $"g2").agg(count(lit(1)).as("n"), sum($"v").as("s")))
    // sketch missing for one of the path keys: declines (fk2 unsketched)
    val bare = base + "/bare"
    VersionedTable.write(
      (1L to 200L).map(i => (i, i % 5, i % 3, i))
        .toDF("id", "fk1", "fk2", "v"), bare)
    VersionedTable.analyzeNdv(spark, bare, Seq("fk1"))
    def declines(q: org.apache.spark.sql.DataFrame): Unit =
      assert(partialAggs(q) == 0, q.queryExecution.optimizedPlan.toString)
    declines(VersionedTable.read(spark, bare)
      .join(dd1, $"fk1" === $"pk1").join(dd2, $"fk2" === $"pk2")
      .groupBy($"g1", $"g2").agg(sum($"v").as("s")))
  }
}
