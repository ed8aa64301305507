package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{GreaterThan, IsNotNull}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedTable

/** Constraint-implied filter pruning: a query conjunct restating a
  * validated CHECK constraint drops from the plan — under the filter's
  * own IsNotNull guards, because CHECK passes NULL (ANSI) while a filter
  * drops it. */
class ConstraintPruningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("conprune").toString + "/t"

  private def filterConds(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect { case LFilter(c, _) => c }

  private def hasGtOn(df: DataFrame, col: String): Boolean =
    filterConds(df).exists(_.exists {
      case GreaterThan(
          a: org.apache.spark.sql.catalyst.expressions.AttributeReference, _)
          if a.name == col => true
      case _ => false
    })

  private def withRuleOff[A](f: => A): A = {
    spark.conf.set("spark.graft.constraintPruning.enabled", "false")
    try f finally
      spark.conf.set("spark.graft.constraintPruning.enabled", "true")
  }

  test("a conjunct restating the CHECK drops; NULL semantics survive") {
    val path = tmp()
    VersionedTable.write(Seq(
      (1L, java.lang.Long.valueOf(5L)), (2L, java.lang.Long.valueOf(7L)),
      (3L, null.asInstanceOf[java.lang.Long])).toDF("k", "v"),
      path, statsCols = Seq("k"))
    // validates existing rows: v>0 TRUE or NULL everywhere — accepted
    VersionedTable.addCheckConstraint(spark, path, "v_pos", "v > 0")
    def q() = VersionedTable.read(spark, path)
      .filter(col("v") > 0 && col("k") < 10)
    val on = q()
    assert(!hasGtOn(on, "v"),
      s"the restated CHECK conjunct must drop:\n${on.queryExecution.optimizedPlan}")
    // the IsNotNull license itself stays — it is what keeps the NULL row out
    assert(filterConds(on).exists(_.exists {
      case IsNotNull(a: org.apache.spark.sql.catalyst.expressions.AttributeReference)
          if a.name == "v" => true
      case _ => false
    }), s"IsNotNull(v) must survive:\n${on.queryExecution.optimizedPlan}")
    val got = on.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L), s"the NULL-v row must stay dropped: $got")
    withRuleOff { assert(q().collect().map(_.getLong(0)).sorted.toSeq == got) }
    // a conjunct the constraint does NOT state keeps its comparison
    val stricter = VersionedTable.read(spark, path).filter(col("v") > 6)
    assert(hasGtOn(stricter, "v"),
      "v > 6 is not implied by CHECK (v > 0) — must keep")
    assert(stricter.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // without an IsNotNull companion the drop declines (a lone v > 0
    // could only come un-inferred from a shape we must not touch)
    val lone = VersionedTable.read(spark, path)
      .filter(col("v") > 0 || col("k") === 99L)
    assert(lone.collect().length == 2,
      "disjunctions are untouched and stay correct")
  }

  test("implication matrix: range/IN/≠ conjuncts implied by the CHECK drop") {
    val path = tmp()
    VersionedTable.write(Seq((1L, 10L, "a"), (2L, 25L, "b"))
      .toDF("k", "v", "s"), path, statsCols = Seq("k"))
    VersionedTable.addCheckConstraint(spark, path, "v_min", "v >= 10")
    VersionedTable.addCheckConstraint(spark, path, "s_dom", "s IN ('a','b')")
    def conds(df: DataFrame) = filterConds(df).flatMap { c =>
      def split(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
          split(a) ++ split(b)
        case x => Seq(x)
      }
      split(c)
    }
    def cmpCount(df: DataFrame): Int = conds(df).count {
      case _: IsNotNull => false
      case _ => true
    }
    // every one of these is implied: v>=10 ⇒ v>=5, v>4, v≠3; IN ⊆; s≠'z'
    val implied = VersionedTable.read(spark, path).filter(
      col("v") >= 5 && col("v") > 4 && col("v") =!= 3 &&
        col("s").isin("a", "b", "c") && col("s") =!= "z" && col("k") < 10)
    assert(cmpCount(implied) == 1,
      s"only k < 10 may survive:\n${implied.queryExecution.optimizedPlan}")
    val got = implied.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L))
    withRuleOff {
      assert(VersionedTable.read(spark, path).filter(
        col("v") >= 5 && col("v") > 4 && col("v") =!= 3 &&
          col("s").isin("a", "b", "c") && col("s") =!= "z" && col("k") < 10)
        .collect().map(_.getLong(0)).sorted.toSeq == got)
    }
    // NOT implied: stronger ranges, opposite side, ≠ inside the interval,
    // IN not a superset — all keep their comparison
    Seq(col("v") >= 20, col("v") <= 100, col("v") =!= 15,
      col("s").isin("a", "z")).foreach { c =>
      val q = VersionedTable.read(spark, path).filter(c && col("k") < 10)
      assert(cmpCount(q) == 2,
        s"$c is not implied by the CHECKs:\n${q.queryExecution.optimizedPlan}")
    }
    // BETWEEN splits: the implied half drops, the other half stays
    val between = VersionedTable.read(spark, path)
      .filter(col("v").between(5, 100) && col("k") < 10)
    assert(cmpCount(between) == 2, // k < 10 and v <= 100
      s"v >= 5 must drop, v <= 100 must stay:\n${between.queryExecution.optimizedPlan}")
    assert(between.count() == 2L)
    // a multi-conjunct CHECK licenses each of its conjuncts independently
    // (FALSE AND NULL = FALSE: a passing row has every conjunct
    // TRUE-or-NULL)
    val path2 = tmp()
    VersionedTable.write(Seq((1L, 10L, 5L)).toDF("k", "v", "w"), path2,
      statsCols = Seq("k"))
    VersionedTable.addCheckConstraint(spark, path2, "both",
      "v >= 10 AND w > 0")
    val multi = VersionedTable.read(spark, path2)
      .filter(col("v") >= 7 && col("w") > 0 && col("k") < 10)
    assert(cmpCount(multi) == 1,
      s"both CHECK conjuncts must license drops:\n${multi.queryExecution.optimizedPlan}")
    assert(multi.count() == 1L)
  }

  test("property sweep: any drop the implication matrix makes is value-safe") {
    // one table per CHECK family; for each, sweep every comparison shape
    // x value against rule-off ground truth — the kept cases validate
    // trivially, the dropped ones prove the implication sound (including
    // over the NULL row, which CHECK admits and filters must drop)
    val ks = Seq("v >= 10", "v > 3", "v <= 7", "v IN (2, 4, 6)", "v = 5",
      "v >= 2 AND v <= 12")
    val values = Seq(-5L, 0L, 2L, 3L, 4L, 5L, 6L, 7L, 10L, 12L, 15L)
    ks.foreach { k =>
      val path = tmp()
      // rows satisfying the CHECK (or NULL) — generated per K by eval
      val admitted = values.filter { v =>
        k match {
          case "v >= 10" => v >= 10
          case "v > 3" => v > 3
          case "v <= 7" => v <= 7
          case "v IN (2, 4, 6)" => Seq(2L, 4L, 6L).contains(v)
          case "v = 5" => v == 5
          case _ => v >= 2 && v <= 12
        }
      }
      VersionedTable.write(
        (admitted.zipWithIndex.map { case (v, i) =>
          (i.toLong, java.lang.Long.valueOf(v)) } :+
          (99L, null.asInstanceOf[java.lang.Long]))
          .toDF("k", "v"), path, statsCols = Seq("k"))
      VersionedTable.addCheckConstraint(spark, path, "kk", k)
      val cs: Seq[org.apache.spark.sql.Column] = values.flatMap { c =>
        Seq(col("v") >= c, col("v") > c, col("v") <= c, col("v") < c,
          col("v") === c, col("v") =!= c,
          col("v").isin(c, c + 2, c + 11))
      }
      cs.foreach { c =>
        def run() = VersionedTable.read(spark, path)
          .filter(c && col("k") < 1000)
          .collect().map(_.getLong(0)).sorted.toSeq
        val on = run()
        val off = withRuleOff(run())
        assert(on == off, s"K=[$k] C=[$c]: on=$on off=$off")
      }
    }
  }

  test("legacy-mode Divide/Cast refuse the null-rejection license") {
    val ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val path = tmp()
      // qty = 0: total/qty is NULL in legacy mode — the CHECK passes it
      // (TRUE-or-NULL), both columns are non-null, and a query restating
      // the CHECK must NOT drop: its own evaluation is NULL → row out.
      // nullIntolerant alone would license the drop (Divide is
      // null-intolerant yet returns NULL on 1/0); the nullability check
      // refuses it.
      VersionedTable.write(Seq((1L, 10L, 2L), (2L, 10L, 0L))
        .toDF("k", "total", "qty"), path, statsCols = Seq("k"))
      VersionedTable.addCheckConstraint(spark, path, "ratio_pos",
        "total / qty >= 0")
      def q() = VersionedTable.read(spark, path)
        .filter(col("total") / col("qty") >= 0 && col("k") < 10)
      val on = q()
      val hasDivCmp = filterConds(on).exists(_.exists {
        case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
            _: org.apache.spark.sql.catalyst.expressions.Divide, _) => true
        case _ => false
      })
      assert(hasDivCmp,
        s"legacy Divide can NULL on non-null inputs — the conjunct must " +
          s"stay:\n${on.queryExecution.optimizedPlan}")
      val got = on.collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L), s"the qty=0 row must stay dropped: $got")
      withRuleOff { assert(q().collect().map(_.getLong(0)).toSeq == got) }
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi0)
  }

  test("time travel sees the constraints of ITS version; MV rewrite unaffected") {
    val path = tmp()
    VersionedTable.write(Seq((1L, 5L), (2L, 7L)).toDF("k", "v"),
      path, statsCols = Seq("k"))                                     // v1
    VersionedTable.addCheckConstraint(spark, path, "v_pos", "v > 0")  // v2
    // the pinned v1 relation carries no constraint — nothing drops
    val old = VersionedTable.read(spark, path, Some(1L))
      .filter(col("v") > 0 && col("k") < 10)
    assert(hasGtOn(old, "v"),
      "a pre-constraint snapshot must not prune by a later declaration")
    assert(old.count() == 2L)
    // a view whose WHERE restates the constraint still rewrites: the
    // pruning rule runs AFTER the MV rewrite, which needs the conjunct
    val mv = path + "_mv"
    graft.sources.MaterializedView.create(spark, path, mv, Seq("k"),
      Seq("v"), Nil, where = Some("v > 0"), partitionBy = Nil)
    val starQ = VersionedTable.read(spark, path)
      .filter(col("v") > 0)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val roots = org.apache.spark.sql.graft.GraftBatchShim.scanRootsOf(starQ)
      .map(_.toString)
    assert(roots.contains(mv) && !roots.contains(path),
      s"the filtered view rewrite must still fire: $roots")
  }
}
