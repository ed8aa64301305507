package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBatchShim

import graft.SparkSpec
import graft.sources.{ForeignKeys, VersionedTable}

/** FOREIGN KEY ... RELY: declaration validates integrity at exact pins,
  * and join elimination drops a dim the query never reads — only while
  * both tables still sit at the validated versions. */
class ForeignKeySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("fk").toString

  private def roots(df: DataFrame): Seq[String] =
    GraftBatchShim.scanRootsOf(df).map(_.toString)

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Asserts the plan dropped the dim AND that the answer equals the
    * un-eliminated one. */
  private def assertEliminates(dim: String, q: => DataFrame): Unit = {
    val on = q
    assert(!roots(on).contains(dim),
      s"expected the join to $dim to drop, scanned ${roots(on)}")
    spark.conf.set("spark.graft.fk.elimination.enabled", "false")
    try {
      val off = q
      assert(roots(off).contains(dim), s"kill-switch ignored: ${roots(off)}")
      assert(sorted(on) == sorted(off))
    } finally
      spark.conf.set("spark.graft.fk.elimination.enabled", "true")
  }

  test("declaration validates: duplicate pk, null fk, and orphans all refuse") {
    val base = tmp(); val fact = base + "/fact"
    VersionedTable.write(Seq((1L, 1L), (2L, 2L)).toDF("id", "fk"), fact)
    val dup = base + "/dup"
    VersionedTable.write(Seq((1L, "a"), (1L, "b")).toDF("pk", "g"), dup)
    val e1 = intercept[IllegalArgumentException] {
      ForeignKeys.declare(spark, fact, Seq("fk"), dup, Seq("pk")) }
    assert(e1.getMessage.contains("not"), e1.getMessage)
    val dim = base + "/dim"
    VersionedTable.write(Seq((1L, "a")).toDF("pk", "g"), dim)
    // fk=2 has no pk=2 match
    val e2 = intercept[IllegalArgumentException] {
      ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk")) }
    assert(e2.getMessage.contains("absent"), e2.getMessage)
    val nulls = base + "/nulls"
    VersionedTable.write(Seq((1L, Some(1L)), (2L, None))
      .toDF("id", "fk"), nulls)
    VersionedTable.append(Seq((2L, "b")).toDF("pk", "g"), dim)
    val e3 = intercept[IllegalArgumentException] {
      ForeignKeys.declare(spark, nulls, Seq("fk"), dim, Seq("pk")) }
    assert(e3.getMessage.contains("NULL"), e3.getMessage)
    // no declaration landed anywhere
    assert(ForeignKeys.declsIn(
      VersionedTable.propertiesOf(spark, fact)).isEmpty)
  }

  test("join elimination: fires on fact-only reads, declines on every disarm") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      (1L to 100L).map(i => (i, i % 10, i)).toDF("id", "fk", "v"),
      fact, statsCols = Seq("id"))
    VersionedTable.write(
      (0L to 9L).map(k => (k, "g" + k % 3)).toDF("pk", "g"), dim,
      statsCols = Seq("pk"))
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    def q = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim),
        col("fk") === col("pk"))
      .groupBy((col("fk") % 2).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    assertEliminates(dim, q)
    // a fact-side filter only shrinks the fact: still fires
    assertEliminates(dim, VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"))
      .filter(col("v") > 50L)
      .select(col("id"), col("v")))
    // reading a dim column declines
    assert(roots(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))).contains(dim))
    // a dim-side filter ON THE KEY transposes to the fact's fk: still drops
    assertEliminates(dim, VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).filter(col("pk") < 5L),
        col("fk") === col("pk"))
      .select(col("id")))
    // a dim-side filter on a NON-key column changes which fact rows
    // survive: declines
    assert(roots(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).filter(col("g") === "g1"),
        col("fk") === col("pk"))
      .select(col("id"))).contains(dim))
    // undeclared key pairing declines
    assert(roots(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("id") === col("pk"))
      .select(col("v"))).contains(dim))
    // fact motion disarms (the new rows were never validated)...
    VersionedTable.append(Seq((999L, 42L, 1L)).toDF("id", "fk", "v"), fact)
    assert(roots(q).contains(dim), "fact moved — the pin must disarm")
    // ...and the orphan fk=42 makes re-declaration REFUSE (exactly right:
    // eliminating now would change answers)
    intercept[IllegalArgumentException] {
      ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk")) }
    VersionedTable.delete(spark, fact, col("id") === 999L)
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    assertEliminates(dim, q)
    // dim motion disarms too; re-declare re-arms
    VersionedTable.append(Seq((10L, "gNEW")).toDF("pk", "g"), dim)
    assert(roots(q).contains(dim), "dim moved — the pin must disarm")
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    assertEliminates(dim, q)
  }

  test("LEFT-join elimination: a UNIQUE pin alone drops an unread lookup") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    // the left side needs NO declaration and NO integrity: orphan fks and
    // null fks are fine — a left join keeps those rows regardless
    VersionedTable.write(
      Seq((1L, Some(1L), 10L), (2L, Some(99L), 20L), (3L, None, 30L))
        .toDF("id", "fk", "v"), fact)
    VersionedTable.write(
      (0L to 9L).map(k => (k, "g" + k)).toDF("pk", "g"), dim)
    ForeignKeys.declareUnique(spark, dim, Seq("pk"))
    def q = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"),
        "left")
      .select(col("id"), col("v"))
    assertEliminates(dim, q)
    // a dim-side filter is harmless for LEFT joins: still fires
    assertEliminates(dim, VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).filter(col("pk") < 5L),
        col("fk") === col("pk"), "left")
      .groupBy(col("fk")).agg(sum(col("v")).as("s")))
    // an INNER join must NOT fire off a unique pin alone (orphans/nulls
    // drop rows — only the FK pin proves they don't)
    assert(roots(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"))
      .select(col("id"))).contains(dim))
    // reading a dim column declines; dim motion disarms
    assert(roots(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"),
        "left")
      .select(col("id"), col("g"))).contains(dim))
    VersionedTable.append(Seq((10L, "g10")).toDF("pk", "g"), dim)
    assert(roots(q).contains(dim), "dim moved — the unique pin must disarm")
    // SQL twins re-arm and drop
    spark.sql(s"ALTER TABLE graft.`$dim` ADD UNIQUE (pk) RELY")
    assertEliminates(dim, q)
    spark.sql(s"ALTER TABLE graft.`$dim` DROP UNIQUE (pk)")
    assert(roots(q).contains(dim))
  }

  test("RIGHT-join elimination: the mirror spelling drops on both licenses") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      Seq((1L, Some(1L), 10L), (2L, Some(99L), 20L), (3L, None, 30L))
        .toDF("id", "fk", "v"), fact)
    VersionedTable.write(
      (0L to 9L).map(k => (k, "g" + k)).toDF("pk", "g"), dim)
    ForeignKeys.declareUnique(spark, dim, Seq("pk"))
    // unique-pin license: dim RIGHT JOIN fact (the fact is the PRESERVED
    // side — orphans and null fks survive regardless), nothing reads the dim
    def q = VersionedTable.read(spark, dim)
      .join(VersionedTable.read(spark, fact), col("fk") === col("pk"),
        "right")
      .select(col("id"), col("v"))
    assertEliminates(dim, q)
    // a dim-side filter is harmless (lost matches are unread nulls)
    assertEliminates(dim, VersionedTable.read(spark, dim)
      .filter(col("pk") < 5L)
      .join(VersionedTable.read(spark, fact), col("fk") === col("pk"),
        "right")
      .groupBy(col("fk")).agg(sum(col("v")).as("s")))
    // reading a dim column declines
    assert(roots(VersionedTable.read(spark, dim)
      .join(VersionedTable.read(spark, fact), col("fk") === col("pk"),
        "right")
      .select(col("id"), col("g"))).contains(dim))
    // full FK pin: a pinned RIGHT join IS an inner join — drop WITH dim
    // key substitution, same as the LEFT mirror
    val fact2 = base + "/fact2"
    VersionedTable.write(
      (1L to 100L).map(i => (i, i % 10, i)).toDF("id", "fk", "v"), fact2,
      statsCols = Seq("id"))
    ForeignKeys.declare(spark, fact2, Seq("fk"), dim, Seq("pk"))
    assertEliminates(dim, VersionedTable.read(spark, dim)
      .join(VersionedTable.read(spark, fact2), col("fk") === col("pk"),
        "right")
      .groupBy((col("pk") % 2).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("pk")).as("spk"),
        sum(col("v")).as("s")))
    // dim motion disarms the mirror too
    VersionedTable.append(Seq((10L, "g10")).toDF("pk", "g"), dim)
    assert(roots(q).contains(dim), "dim moved — the pin must disarm")
  }

  test("re-declaring validates incrementally: O(delta) re-pin, violations still refuse") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      (1L to 100L).map(i => (i, i % 10, i)).toDF("id", "fk", "v"), fact,
      statsCols = Seq("id"))
    VersionedTable.write(
      (0L to 9L).map(k => (k, "g" + k)).toDF("pk", "g"), dim,
      statsCols = Seq("pk"))
    def counters = (ForeignKeys.fullValidations.get,
      ForeignKeys.incrementalValidations.get)
    val (f0, i0) = counters
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    assert(counters == (f0 + 1, i0), "first declaration is the full pass")
    // still armed → no-op, no validation at all, no version bump
    val vBefore = VersionedTable.latestVersion(spark, fact).get
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    assert(counters == (f0 + 1, i0))
    assert(VersionedTable.latestVersion(spark, fact).contains(vBefore))
    // the daily-load shape: append + delete on the fact, append on the
    // dim → re-declare takes the INCREMENTAL path and re-arms
    VersionedTable.append(Seq((200L, 3L, 7L)).toDF("id", "fk", "v"), fact)
    VersionedTable.delete(spark, fact, col("id") <= 10L)
    VersionedTable.append(Seq((10L, "g10")).toDF("pk", "g"), dim)
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    assert(counters == (f0 + 1, i0 + 1), "post-load re-pin must be O(delta)")
    def q = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"))
      .select(col("id"), col("v"))
    assertEliminates(dim, q)
    // an appended ORPHAN is caught by the incremental path
    VersionedTable.append(Seq((300L, 77L, 1L)).toDF("id", "fk", "v"), fact)
    val (f1, i1) = counters
    val e = intercept[IllegalArgumentException] {
      ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk")) }
    assert(e.getMessage.contains("absent"), e.getMessage)
    assert(counters == (f1, i1 + 1), "the refusal itself was incremental")
    // a dim-key DELETE that orphans existing fact rows is caught too
    VersionedTable.delete(spark, fact, col("id") === 300L)
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk")) // re-arm
    VersionedTable.delete(spark, dim, col("pk") === 3L)
    val e2 = intercept[IllegalArgumentException] {
      ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk")) }
    assert(e2.getMessage.contains("absent"), e2.getMessage)
    // UNIQUE re-pin: incremental after an append, dup insert refused
    val (f2, i2) = counters
    ForeignKeys.declareUnique(spark, dim, Seq("pk"))
    assert(counters == (f2 + 1, i2), "first unique declaration is full")
    VersionedTable.append(Seq((20L, "g20")).toDF("pk", "g"), dim)
    ForeignKeys.declareUnique(spark, dim, Seq("pk"))
    assert(counters == (f2 + 1, i2 + 1))
    VersionedTable.append(Seq((20L, "dup")).toDF("pk", "g"), dim)
    val e3 = intercept[IllegalArgumentException] {
      ForeignKeys.declareUnique(spark, dim, Seq("pk")) }
    assert(e3.getMessage.contains("not unique"), e3.getMessage)
  }

  test("graft.fk.autoRepin: loads re-arm the pins; a violating load leaves them disarmed") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      (1L to 60L).map(i => (i, i % 6, i)).toDF("id", "fk", "v"), fact,
      statsCols = Seq("id"))
    VersionedTable.write(
      (0L to 5L).map(k => (k, "g" + k)).toDF("pk", "g"), dim)
    VersionedTable.setProperties(spark, fact,
      Map("graft.fk.autoRepin" -> "true"))
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    def q = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"))
      .select(col("id"), col("v"))
    assertEliminates(dim, q)
    // a clean load: the post-commit hook re-pins incrementally — the
    // elimination stays armed with no operator in the loop
    val (f0, i0) = (ForeignKeys.fullValidations.get,
      ForeignKeys.incrementalValidations.get)
    VersionedTable.append(Seq((100L, 3L, 7L)).toDF("id", "fk", "v"), fact)
    assert(ForeignKeys.fullValidations.get == f0 &&
      ForeignKeys.incrementalValidations.get == i0 + 1)
    assertEliminates(dim, q)
    // DIM-side chaining via the reverse roster: a dim opting in re-pins
    // the facts that reference it (declare registered the fact on the
    // dim's graft.fk.referencedBy BEFORE reading the pin)
    VersionedTable.setProperties(spark, dim,
      Map("graft.fk.autoRepin" -> "true"))
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk")) // re-arm
    VersionedTable.append(Seq((6L, "g6")).toDF("pk", "g"), dim)
    assertEliminates(dim, q)
    // a violating load: the hook's re-declare refuses, the commit stands,
    // and the pin just stays disarmed (elimination declines — correct)
    VersionedTable.append(Seq((101L, 99L, 8L)).toDF("id", "fk", "v"), fact)
    assert(VersionedTable.read(spark, fact).count() == 62L,
      "the load itself must stand")
    assert(roots(q).contains(dim), "a stale pin must decline, not throw")
  }

  test("DISTINCT elimination: a covering UNIQUE pin drops the dedup aggregate") {
    val base = tmp(); val t = base + "/t"
    VersionedTable.write(
      (1L to 50L).map(i => (i, i % 5, i * 2)).toDF("id", "g", "v"), t,
      statsCols = Seq("id"))
    ForeignKeys.declareUnique(spark, t, Seq("id"))
    def hasAgg(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate])
    // covering DISTINCTs collapse: all columns, a subset including the key,
    // and under a filter (fewer rows are still unique)
    def q1 = VersionedTable.read(spark, t).distinct()
    def q2 = VersionedTable.read(spark, t).select("id", "v").distinct()
    def q3 = VersionedTable.read(spark, t).filter(col("g") === 2L).distinct()
    Seq(q1, q2, q3).foreach { q =>
      assert(!hasAgg(q), q.queryExecution.optimizedPlan.toString)
    }
    spark.conf.set("spark.graft.fk.elimination.enabled", "false")
    val (offAgg, offRows) =
      try (hasAgg(q1), sorted(q1))
      finally spark.conf.set("spark.graft.fk.elimination.enabled", "true")
    assert(offAgg, "kill-switch ignored")
    assert(offRows == sorted(q1), "elimination changed the answer")
    // dropDuplicates(subset) — the Deduplicate → Aggregate(First) shape —
    // collapses too when the subset covers the key, and its non-key
    // columns survive verbatim (one-row groups make First an identity)
    def q4 = VersionedTable.read(spark, t).dropDuplicates("id")
    assert(!hasAgg(q4), q4.queryExecution.optimizedPlan.toString)
    spark.conf.set("spark.graft.fk.elimination.enabled", "false")
    val (ddAgg, ddRows) =
      try (hasAgg(q4), sorted(q4))
      finally spark.conf.set("spark.graft.fk.elimination.enabled", "true")
    assert(ddAgg && ddRows == sorted(q4))
    // a NON-covering dropDuplicates keeps its aggregate
    assert(hasAgg(VersionedTable.read(spark, t).dropDuplicates("g")))
    // keep-latest window dedup: row_number partitioned by the covering
    // key is the literal 1 — the Window collapses and constant folding
    // kills the filter; rank() collapses the same way
    import org.apache.spark.sql.expressions.{Window => W}
    def hasWindow(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window])
    def q5 = VersionedTable.read(spark, t)
      .withColumn("rn", row_number().over(W.partitionBy("id").orderBy("v")))
      .filter(col("rn") === 1).drop("rn")
    assert(!hasWindow(q5), q5.queryExecution.optimizedPlan.toString)
    assert(!q5.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]),
      "constant folding must kill the rn = 1 filter")
    spark.conf.set("spark.graft.fk.elimination.enabled", "false")
    val (wOff, wRows) =
      try (hasWindow(q5), sorted(q5))
      finally spark.conf.set("spark.graft.fk.elimination.enabled", "true")
    assert(wOff && wRows == sorted(q5))
    assert(!hasWindow(VersionedTable.read(spark, t)
      .withColumn("r", rank().over(W.partitionBy("id").orderBy("v")))))
    // a NON-covering partition keeps its window
    assert(hasWindow(VersionedTable.read(spark, t)
      .withColumn("rn", row_number().over(W.partitionBy("g").orderBy("v")))
      .filter(col("rn") === 1)))
    // a non-ranking window function keeps its window even on the key
    assert(hasWindow(VersionedTable.read(spark, t)
      .withColumn("s", sum("v").over(W.partitionBy("id")))))
    // NON-covering distinct keeps its aggregate (g,v are not unique)...
    assert(hasAgg(VersionedTable.read(spark, t).select("g", "v").distinct()))
    // ...and table motion disarms
    VersionedTable.append(Seq((99L, 0L, 0L)).toDF("id", "g", "v"), t)
    assert(hasAgg(VersionedTable.read(spark, t).distinct()))
    assert(hasAgg(VersionedTable.read(spark, t).dropDuplicates("id")))
  }

  test("SQL surface: ADD FOREIGN KEY ... RELY eliminates; DROP disarms") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      (1L to 40L).map(i => (i, i % 4, i)).toDF("id", "fk", "v"), fact)
    VersionedTable.write(
      (0L to 3L).map(k => (k, "g" + k)).toDF("pk", "g"), dim)
    spark.sql(s"ALTER TABLE graft.`$fact` ADD FOREIGN KEY (fk) " +
      s"REFERENCES graft.`$dim` (pk) RELY")
    def q = spark.sql(s"SELECT fk, COUNT(*) AS n, SUM(v) AS s " +
      s"FROM graft.`$fact` JOIN graft.`$dim` ON fk = pk GROUP BY fk")
    assertEliminates(dim, q)
    spark.sql(s"ALTER TABLE graft.`$fact` DROP FOREIGN KEY (fk)")
    assert(roots(q).contains(dim), "dropped declaration must disarm")
    // DESCRIBE DETAIL surfaces the pins with their armed/stale state.
    // Each declaration's props commit bumps the dim and stales the other
    // pin — the final FK re-declare is the empty-diff incremental re-pin
    // that leaves BOTH armed (the operational sequence an operator runs)
    spark.sql(s"ALTER TABLE graft.`$fact` ADD FOREIGN KEY (fk) " +
      s"REFERENCES graft.`$dim` (pk) RELY")
    spark.sql(s"ALTER TABLE graft.`$dim` ADD UNIQUE (pk) RELY")
    spark.sql(s"ALTER TABLE graft.`$fact` ADD FOREIGN KEY (fk) " +
      s"REFERENCES graft.`$dim` (pk) RELY")
    val df = spark.sql(s"DESCRIBE DETAIL graft.`$fact`").collect().head
    assert(df.getAs[String]("foreign_keys") ==
      s"(fk)->$dim(pk)[armed]", df.getAs[String]("foreign_keys"))
    val dd = spark.sql(s"DESCRIBE DETAIL graft.`$dim`").collect().head
    assert(dd.getAs[String]("unique_keys") == "(pk)[armed]",
      dd.getAs[String]("unique_keys"))
    VersionedTable.append(Seq((99L, "gX")).toDF("pk", "g"), dim)
    val stale = spark.sql(s"DESCRIBE DETAIL graft.`$fact`").collect().head
    assert(stale.getAs[String]("foreign_keys").endsWith("[stale]"),
      stale.getAs[String]("foreign_keys"))
  }

  test("join elimination substitutes the fact key when only the dim KEY is read") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      (1L to 100L).map(i => (i, i % 10, i)).toDF("id", "fk", "v"),
      fact, statsCols = Seq("id"))
    VersionedTable.write(
      (0L to 9L).map(k => (k, "g" + k % 3)).toDF("pk", "g"), dim,
      statsCols = Seq("pk"))
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    // the SELECT-includes-the-join-key BI shape: pk is read in a group
    // key AND an aggregate input — both substitute to fk, dim drops
    assertEliminates(dim, VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"))
      .groupBy((col("pk") % 2).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("pk")).as("spk"),
        sum(col("v")).as("s")))
    // plain projection of the key, through a filter between join and parent
    assertEliminates(dim, VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"))
      .filter(col("pk") > 3L)
      .select(col("id"), col("pk")))
    // a NON-key dim column still blocks the drop
    assert(roots(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"))
      .groupBy(col("pk")).agg(count(col("g")).as("n"))).contains(dim))
    // a LEFT join under the FK pin IS an inner join: drop + substitution
    assertEliminates(dim, VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"),
        "left")
      .groupBy((col("pk") % 2).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("pk")).as("spk")))
    // ...but a dim-side KEY filter under LEFT declines (a lost match
    // NULLS the row instead of dropping it)
    assert(roots(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).filter(col("pk") < 5L),
        col("fk") === col("pk"), "left")
      .select(col("id"), col("pk"))).contains(dim))
    // motion disarms the substitution too
    VersionedTable.append(Seq((10L, "gZ")).toDF("pk", "g"), dim)
    assert(roots(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim), col("fk") === col("pk"))
      .select(col("id"), col("pk"))).contains(dim))
  }

  test("self-join on a pinned unique key collapses to one scan") {
    val base = tmp(); val t = base + "/t"
    // one NULL-keyed row: the pin allows at most one, and a plain `=`
    // self-join drops it — the IS NOT NULL guard must reproduce that
    VersionedTable.write(
      ((1L to 50L).map(i => (Some(i), "s" + i % 3, i * 2)) :+
        ((None: Option[Long], "snull", 0L)))
        .toDF("k", "s", "v"), t, statsCols = Seq("v"))
    ForeignKeys.declareUnique(spark, t, Seq("k"))
    def joins(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    def a = VersionedTable.read(spark, t)
    def b = VersionedTable.read(spark, t)
    /** collapse asserted by plan shape AND by value equality vs rule-off */
    def assertCollapses(q: => DataFrame): Unit = {
      val on = q
      assert(joins(on) == 0, s"expected the self-join to collapse:\n" +
        on.queryExecution.optimizedPlan)
      spark.conf.set("spark.graft.fk.elimination.enabled", "false")
      try {
        val off = q
        assert(joins(off) == 1, "kill-switch ignored")
        assert(sorted(on) == sorted(off))
      } finally
        spark.conf.set("spark.graft.fk.elimination.enabled", "true")
    }
    def self(l: DataFrame, r: DataFrame) =
      l.join(r, l("k") === r("k"))
        .select(l("k"), l("s"), r("v").as("v_r"))
    assertCollapses(self(a, b))
    // null-key row really drops on both shapes (51 rows in, 50 out)
    assert(self(a, b).count() == 50L)
    // a filter on either side still collapses (the other side stays whole)
    assertCollapses {
      val l = a.filter(col("v") > 40L); val r = b
      l.join(r, l("k") === r("k")).select(l("k"), r("s").as("s_r"))
    }
    assertCollapses {
      val l = a; val r = b.filter(col("v") > 40L)
      l.join(r, l("k") === r("k")).select(l("s"), r("k").as("k_r"))
    }
    // <=> keeps the null row: 51 rows, still collapsed
    val nsafe = {
      val l = a; val r = b
      l.join(r, l("k") <=> r("k")).select(l("k"), r("v").as("v_r"))
    }
    assert(joins(nsafe) == 0, nsafe.queryExecution.optimizedPlan.toString)
    assert(nsafe.count() == 51L)
    // declines: filters on BOTH sides (neither side can vouch whole)
    assert(joins {
      val l = a.filter(col("v") > 10L); val r = b.filter(col("v") < 90L)
      l.join(r, l("k") === r("k")).select(l("k"), r("s").as("s_r"))
    } == 1)
    // declines: equated column is not the unique key
    assert(joins {
      val l = a; val r = b
      l.join(r, l("s") === r("s")).select(l("k"), r("k").as("k2"))
    } == 1)
    // declines: a non-equality conjunct (v > v is not provably vacuous)
    assert(joins {
      val l = a; val r = b
      l.join(r, l("k") === r("k") && l("v") >= r("v"))
        .select(l("k"), r("s").as("s2"))
    } == 1)
    // declines: sides at different versions (time travel on one side)
    VersionedTable.append(Seq((Some(99L), "sX", 99L)).toDF("k", "s", "v"), t)
    val old = VersionedTable.read(spark, t, Some(1L))
    val newer = VersionedTable.read(spark, t, Some(2L))
    assert(joins(newer
      .join(old, newer("k") === old("k")).select(old("v").as("v2"))) == 1)
    // motion disarmed the pin entirely; re-declare re-arms incrementally
    assert(joins(self(a, b)) == 1)
    ForeignKeys.declareUnique(spark, t, Seq("k"))
    assertCollapses(self(a, b))
  }

  test("semi/anti elimination: IN-subquery on a pinned FK is an identity, NOT EXISTS is empty") {
    val base = tmp(); val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write(
      (1L to 100L).map(i => (i, i % 10, i)).toDF("id", "fk", "v"),
      fact, statsCols = Seq("id"))
    VersionedTable.write(
      (0L to 9L).map(k => (k, "g" + k % 3)).toDF("pk", "g"), dim,
      statsCols = Seq("pk"))
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    def joins(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    def assertNoJoin(q: => DataFrame): Unit = {
      val on = q
      assert(joins(on) == 0, on.queryExecution.optimizedPlan.toString)
      spark.conf.set("spark.graft.fk.elimination.enabled", "false")
      try {
        val off = q
        assert(joins(off) == 1, "kill-switch ignored")
        assert(sorted(on) == sorted(off))
      } finally
        spark.conf.set("spark.graft.fk.elimination.enabled", "true")
    }
    // the WHERE-IN validation predicate: an identity under the pin
    assertNoJoin(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).select(col("pk")),
        col("fk") === col("pk"), "left_semi"))
    // a dim key filter transposes: semi keeps exactly σ_p(fk)(fact)
    assertNoJoin(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).filter(col("pk") < 5L)
        .select(col("pk")), col("fk") === col("pk"), "left_semi"))
    // NOT EXISTS: empty under the pin; with a key filter, the complement
    assertNoJoin(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).select(col("pk")),
        col("fk") === col("pk"), "left_anti"))
    assert(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).select(col("pk")),
        col("fk") === col("pk"), "left_anti").count() == 0L)
    assertNoJoin(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).filter(col("pk") < 5L)
        .select(col("pk")), col("fk") === col("pk"), "left_anti"))
    // SQL spelling: IN / NOT EXISTS subqueries plan as semi/anti
    assertNoJoin(spark.sql(s"SELECT id, v FROM graft.`$fact` " +
      s"WHERE fk IN (SELECT pk FROM graft.`$dim`)"))
    assertNoJoin(spark.sql(s"SELECT id FROM graft.`$fact` f " +
      s"WHERE NOT EXISTS (SELECT 1 FROM graft.`$dim` d WHERE d.pk = f.fk)"))
    // a non-key dim filter declines
    assert(joins(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).filter(col("g") === "g1")
        .select(col("pk")), col("fk") === col("pk"), "left_semi")) == 1)
    // motion disarms
    VersionedTable.append(Seq((10L, "gZ")).toDF("pk", "g"), dim)
    assert(joins(VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).select(col("pk")),
        col("fk") === col("pk"), "left_semi")) == 1)
  }

  test("unique-pin aggregates: COUNT(DISTINCT key) de-distincts; GROUP BY key collapses to a Project") {
    val base = tmp(); val t = base + "/t"
    VersionedTable.write(
      ((1L to 60L).map(i =>
        (Some(i), "g" + i % 4, if (i % 5 == 0) None else Some(i * 3),
          BigDecimal(i * 7) / 4)) :+
        ((None: Option[Long], "gn", None: Option[Long], BigDecimal(0))))
        .toDF("k", "g", "v", "m")
        .select(col("k"), col("g"), col("v"),
          col("m").cast("decimal(10,2)").as("m")),
      t, statsCols = Seq("g"))
    ForeignKeys.declareUnique(spark, t, Seq("k"))
    def rd = VersionedTable.read(spark, t)
    def hasDistinct(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
          a.aggregateExpressions.exists(_.exists {
            case ae: org.apache.spark.sql.catalyst.expressions.aggregate
              .AggregateExpression => ae.isDistinct
            case _ => false
          })
        case _ => false
      }
    def hasAgg(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate])
    def offOn[T](q: => DataFrame): (Seq[String], Seq[String]) = {
      val on = sorted(q)
      spark.conf.set("spark.graft.fk.elimination.enabled", "false")
      try (sorted(q), on)
      finally spark.conf.set("spark.graft.fk.elimination.enabled", "true")
    }
    // COUNT(DISTINCT k): de-distincted (global and grouped), values equal
    def qg = rd.groupBy(col("g"))
      .agg(countDistinct(col("k")).as("nk"), count(lit(1)).as("n"))
    assert(!hasDistinct(qg), qg.queryExecution.optimizedPlan.toString)
    val (offG, onG) = offOn(qg); assert(offG == onG)
    def qglob = rd.agg(countDistinct(col("k")).as("nk"))
    assert(!hasDistinct(qglob))
    assert(qglob.collect().head.getLong(0) == 60L) // null key not counted
    // COUNT(DISTINCT non-key) keeps its DISTINCT
    assert(hasDistinct(rd.agg(countDistinct(col("g")).as("ng"))))
    // GROUP BY the key: the whole aggregate becomes a Project — COUNT(*),
    // COUNT(v), SUM long + decimal, MIN/MAX, AVG, even DISTINCT args
    def qk = rd.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        sum(col("v")).as("sv"), sum(col("m")).as("sm"),
        min(col("g")).as("mn"), max(col("v")).as("mx"),
        avg(col("v")).as("av"), avg(col("m")).as("am"),
        sum_distinct(col("v")).as("sdv"))
    assert(!hasAgg(qk), qk.queryExecution.optimizedPlan.toString)
    val (offK, onK) = offOn(qk); assert(offK == onK)
    // grouping by a SUPERSET of the key still collapses
    assert(!hasAgg(rd.groupBy(col("k"), col("g"))
      .agg(sum(col("v")).as("s"))))
    // a non-covering group keeps the aggregate; FILTER clauses decline
    assert(hasAgg(rd.groupBy(col("g")).agg(sum(col("v")).as("s"))))
    assert(hasAgg(rd.groupBy(col("k"))
      .agg(expr("sum(v) FILTER (WHERE v > 10)").as("s"))))
    // motion disarms both rewrites
    VersionedTable.append(Seq((Some(99L), "gX", Some(1L), BigDecimal(1)))
      .toDF("k", "g", "v", "m")
      .select(col("k"), col("g"), col("v"),
        col("m").cast("decimal(10,2)").as("m")), t)
    assert(hasDistinct(rd.agg(countDistinct(col("k")).as("nk"))))
    assert(hasAgg(rd.groupBy(col("k")).agg(sum(col("v")).as("s"))))
  }
}
