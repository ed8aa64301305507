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
