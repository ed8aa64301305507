package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedTable

/** NDV-driven inner-join reordering: `(F ⋈ big) ⋈ tiny` written in the
  * worst order executes as `(F ⋈ tiny) ⋈ big` when the sketches prove a
  * ≥10× output difference — and declines on outer joins, close calls,
  * un-sketched keys, filtered legs, and conditions touching the middle
  * leg. */
class JoinReorderSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("jreorder").toString

  private def rootsUnder(p: LogicalPlan): Set[String] = p.collect {
    case LogicalRelation(fsr: HadoopFsRelation, _, _, _, _) =>
      fsr.location.rootPaths.map(_.toUri.getPath)
  }.flatten.toSet

  /** True when some Join in the optimized plan joins EXACTLY these two
    * tables — i.e. they were paired first. */
  private def pairedFirst(df: DataFrame, a: String, b: String): Boolean =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }
      .exists(j => rootsUnder(j) == Set(a, b))

  private def withRuleOff[A](f: => A): A = {
    spark.conf.set("spark.graft.joinReorder.enabled", "false")
    try f finally spark.conf.set("spark.graft.joinReorder.enabled", "true")
  }

  test("worst-order star swaps the selective dim inward; results exact") {
    val base = tmp()
    val fact = base + "/fact"; val big = base + "/big"; val tiny = base + "/tiny"
    VersionedTable.write(spark.range(0, 20000)
      .select((col("id") % 1000).as("k"), col("id").as("v")),
      fact, statsCols = Seq("k"))
    VersionedTable.analyzeNdv(spark, fact, Seq("k"))
    VersionedTable.write(spark.range(0, 1000)
      .select(col("id").as("bk"), concat(lit("b"), col("id")).as("battr")),
      big, statsCols = Seq("bk"))
    VersionedTable.analyzeNdv(spark, big, Seq("bk"))
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("tk"), concat(lit("t"), col("id")).as("tattr")),
      tiny, statsCols = Seq("tk"))
    VersionedTable.analyzeNdv(spark, tiny, Seq("tk"))
    def q() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(VersionedTable.read(spark, tiny), col("k") === col("tk"))
      .groupBy(col("tattr")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val on = q()
    assert(pairedFirst(on, fact, tiny),
      s"est(F⋈tiny) is 50× smaller — must join tiny first:\n" +
        on.queryExecution.optimizedPlan)
    val got = on.collect().map(_.toString).sorted.toSeq
    withRuleOff {
      val off = q()
      assert(!pairedFirst(off, fact, tiny), "rule off: user order")
      assert(off.collect().map(_.toString).sorted.toSeq == got)
    }
    // already-best order: idempotent, same pairing, no churn
    def qBest() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, tiny), col("k") === col("tk"))
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .groupBy(col("tattr")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    assert(pairedFirst(qBest(), fact, tiny))
    assert(qBest().collect().map(_.toString).sorted.toSeq == got)
  }

  test("a selective dim bubbles down a whole left-deep chain") {
    val base = tmp()
    val fact = base + "/fact"; val b1 = base + "/b1"
    val b2 = base + "/b2"; val tiny = base + "/tiny"
    VersionedTable.write(spark.range(0, 20000)
      .select((col("id") % 1000).as("k"), col("id").as("v")),
      fact, statsCols = Seq("k"))
    VersionedTable.analyzeNdv(spark, fact, Seq("k"))
    Seq((b1, "b1k"), (b2, "b2k")).foreach { case (p, kn) =>
      VersionedTable.write(spark.range(0, 1000).select(col("id").as(kn)),
        p, statsCols = Seq(kn))
      VersionedTable.analyzeNdv(spark, p, Seq(kn))
    }
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("tk"), concat(lit("t"), col("id")).as("tattr")),
      tiny, statsCols = Seq("tk"))
    VersionedTable.analyzeNdv(spark, tiny, Seq("tk"))
    // WORST order: the 50x-selective dim joins LAST, two full dims first
    def q() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, b1), col("k") === col("b1k"))
      .join(VersionedTable.read(spark, b2), col("k") === col("b2k"))
      .join(VersionedTable.read(spark, tiny), col("k") === col("tk"))
      .groupBy(col("tattr")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val on = q()
    assert(pairedFirst(on, fact, tiny),
      s"the selective dim must bubble down to the fact:\n" +
        on.queryExecution.optimizedPlan)
    val got = on.collect().map(_.toString).sorted.toSeq
    withRuleOff {
      val off = q()
      assert(!pairedFirst(off, fact, tiny))
      assert(off.collect().map(_.toString).sorted.toSeq == got)
    }
  }

  test("FILTERED legs estimate: range-filtered fact still swaps; an equality-filtered dim keeps its place") {
    val base = tmp()
    val fact = base + "/fact"; val big = base + "/big"; val tiny = base + "/tiny"
    VersionedTable.write(spark.range(0, 20000)
      .select((col("id") % 1000).as("k"), col("id").as("v")),
      fact, statsCols = Seq("k", "v"))
    VersionedTable.analyzeNdv(spark, fact, Seq("k", "v"))
    VersionedTable.write(spark.range(0, 1000)
      .select(col("id").as("bk"), concat(lit("b"), col("id")).as("battr")),
      big, statsCols = Seq("bk"))
    VersionedTable.analyzeNdv(spark, big, Seq("bk"))
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("tk"), concat(lit("t"), col("id")).as("tattr")),
      tiny, statsCols = Seq("tk"))
    VersionedTable.analyzeNdv(spark, tiny, Seq("tk"))
    // the REAL dashboard shape: a range-filtered fact in the worst order.
    // The range scales both candidates identically (span fraction), so
    // the 50× tiny-vs-big gap survives and the swap still fires.
    def q() = VersionedTable.read(spark, fact)
      .filter(col("v") >= 5000L && col("v") < 15000L)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(VersionedTable.read(spark, tiny), col("k") === col("tk"))
      .groupBy(col("tattr")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val on = q()
    assert(pairedFirst(on, fact, tiny),
      s"range-filtered fact must still swap the selective dim in:\n" +
        on.queryExecution.optimizedPlan)
    val got = on.collect().map(_.toString).sorted.toSeq
    withRuleOff {
      val off = q()
      assert(!pairedFirst(off, fact, tiny))
      assert(off.collect().map(_.toString).sorted.toSeq == got)
    }
    // an equality filter collapses the big dim to ~1 row — the estimate
    // now says the USER's order is right, so no swap happens (the
    // filtered-leg estimate prevents a blind tiny-first reorder)
    def qEq() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, big).filter(col("bk") === 500L),
        col("k") === col("bk"))
      .join(VersionedTable.read(spark, tiny), col("k") === col("tk"))
      .agg(count(lit(1)).as("n"))
    val onEq = qEq()
    assert(!pairedFirst(onEq, fact, tiny),
      s"an equality-filtered big dim (1/1000) must keep its place:\n" +
        onEq.queryExecution.optimizedPlan)
    val gotEq = onEq.collect().map(_.toString).toSeq
    withRuleOff(assert(qEq().collect().map(_.toString).toSeq == gotEq))
    // an OPAQUE conjunct beside an estimable one still declines the leg
    // (never guess): worst order stays
    def qOpaque() = VersionedTable.read(spark, fact)
      .filter(col("v") >= 5000L && col("v") % 3 === 0)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(VersionedTable.read(spark, tiny), col("k") === col("tk"))
      .agg(count(lit(1)).as("n"))
    val onOp = qOpaque()
    assert(!pairedFirst(onOp, fact, tiny),
      "an inestimable conjunct must decline the filtered leg")
    val gotOp = onOp.collect().map(_.toString).toSeq
    withRuleOff(assert(qOpaque().collect().map(_.toString).toSeq == gotOp))
  }

  test("RIGHT-NESTED spelling rotates to left-deep under the same hysteresis") {
    val base = tmp()
    val fact = base + "/fact"; val big = base + "/big"; val tiny = base + "/tiny"
    VersionedTable.write(spark.range(0, 20000)
      .select((col("id") % 1000).as("k"), col("id").as("v")),
      fact, statsCols = Seq("k"))
    VersionedTable.analyzeNdv(spark, fact, Seq("k"))
    VersionedTable.write(spark.range(0, 1000)
      .select(col("id").as("bk"), concat(lit("b"), col("id")).as("battr")),
      big, statsCols = Seq("bk"))
    VersionedTable.analyzeNdv(spark, big, Seq("bk"))
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("tk"), concat(lit("t"), col("id")).as("tattr")),
      tiny, statsCols = Seq("tk"))
    VersionedTable.analyzeNdv(spark, tiny, Seq("tk"))
    // tiny ⋈ (fact ⋈ big): the inner join is the FULL 20000-row fact-big
    // pairing; rotating tiny onto the fact first shrinks it 50×
    def q() = VersionedTable.read(spark, tiny)
      .join(
        VersionedTable.read(spark, fact)
          .join(VersionedTable.read(spark, big), col("k") === col("bk")),
        col("tk") === col("k"))
      .groupBy(col("tattr")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val on = q()
    assert(pairedFirst(on, tiny, fact),
      s"right-nested worst order must rotate tiny onto the fact:\n" +
        on.queryExecution.optimizedPlan)
    val got = on.collect().map(_.toString).sorted.toSeq
    withRuleOff {
      val off = q()
      assert(off.collect().map(_.toString).sorted.toSeq == got)
    }
    // rotation that would EXPAND the first join declines: fact ⋈
    // (big ⋈ tiny) keeps the small inner join first
    def qKeep() = VersionedTable.read(spark, fact)
      .join(
        VersionedTable.read(spark, big)
          .join(VersionedTable.read(spark, tiny), col("bk") === col("tk")),
        col("k") === col("bk"))
      .agg(count(lit(1)).as("n"))
    val onK = qKeep()
    assert(pairedFirst(onK, big, tiny),
      s"a small inner join stays first — no rotation:\n" +
        onK.queryExecution.optimizedPlan)
    val gotK = onK.collect().map(_.toString).toSeq
    withRuleOff(assert(qKeep().collect().map(_.toString).toSeq == gotK))
  }

  test("BUSHY: a composite right leg estimates recursively and swaps in whole") {
    val base = tmp()
    val fact = base + "/fact"; val big = base + "/big"
    val tiny = base + "/tiny"; val tdim = base + "/tdim"
    VersionedTable.write(spark.range(0, 20000)
      .select((col("id") % 1000).as("k"), col("id").as("v")),
      fact, statsCols = Seq("k"))
    VersionedTable.analyzeNdv(spark, fact, Seq("k"))
    VersionedTable.write(spark.range(0, 1000)
      .select(col("id").as("bk"), concat(lit("b"), col("id")).as("battr")),
      big, statsCols = Seq("bk"))
    VersionedTable.analyzeNdv(spark, big, Seq("bk"))
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("tk")), tiny, statsCols = Seq("tk"))
    VersionedTable.analyzeNdv(spark, tiny, Seq("tk"))
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("dk"), concat(lit("d"), col("id")).as("dattr")),
      tdim, statsCols = Seq("dk"))
    VersionedTable.analyzeNdv(spark, tdim, Seq("dk"))
    // worst order: (fact ⋈ big) ⋈ (tiny ⋈ tdim) — the selective COMPOSITE
    // subtree must swap in whole (its estimate composes recursively)
    def q() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(
        VersionedTable.read(spark, tiny)
          .join(VersionedTable.read(spark, tdim), col("tk") === col("dk")),
        col("k") === col("tk"))
      .groupBy(col("dattr")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val on = q()
    // after the swap, some join must pair fact with the {tiny, tdim}
    // subtree BEFORE big joins in
    val pairedComposite = on.queryExecution.optimizedPlan
      .collect { case j: Join => j }
      .exists(j => rootsUnder(j) == Set(fact, tiny, tdim))
    assert(pairedComposite,
      s"the composite selective subtree must pair with the fact first:\n" +
        on.queryExecution.optimizedPlan)
    val got = on.collect().map(_.toString).sorted.toSeq
    withRuleOff {
      val off = q()
      assert(!off.queryExecution.optimizedPlan.collect { case j: Join => j }
        .exists(j => rootsUnder(j) == Set(fact, tiny, tdim)))
      assert(off.collect().map(_.toString).sorted.toSeq == got)
    }
    // idempotence: the already-best bushy spelling re-optimizes to itself
    def qBest() = VersionedTable.read(spark, fact)
      .join(
        VersionedTable.read(spark, tiny)
          .join(VersionedTable.read(spark, tdim), col("tk") === col("dk")),
        col("k") === col("tk"))
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .groupBy(col("dattr")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val best = qBest()
    assert(best.queryExecution.optimizedPlan
      .collect { case j: Join => j }
      .exists(j => rootsUnder(j) == Set(fact, tiny, tdim)))
    assert(best.collect().map(_.toString).sorted.toSeq == got)
  }

  test("CROSS-SPLIT: a top condition touching both composite legs splits per conjunct") {
    val base = tmp()
    val fact = base + "/fact"; val big = base + "/big"
    val tiny = base + "/tiny"; val tdim = base + "/tdim"
    VersionedTable.write(spark.range(0, 20000)
      .select((col("id") % 1000).as("k"), col("id").as("v")),
      fact, statsCols = Seq("k"))
    VersionedTable.analyzeNdv(spark, fact, Seq("k"))
    // big carries a SECOND key the top condition pairs with the right
    // composite — the B-touching case the swap previously declined
    VersionedTable.write(spark.range(0, 1000)
      .select(col("id").as("bk"), col("id").as("bk2")),
      big, statsCols = Seq("bk", "bk2"))
    VersionedTable.analyzeNdv(spark, big, Seq("bk", "bk2"))
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("tk")), tiny, statsCols = Seq("tk"))
    VersionedTable.analyzeNdv(spark, tiny, Seq("tk"))
    VersionedTable.write(spark.range(0, 1000)
      .select(col("id").as("dk"), col("id").as("dd")),
      tdim, statsCols = Seq("dk", "dd"))
    VersionedTable.analyzeNdv(spark, tdim, Seq("dk", "dd"))
    def joins(df: DataFrame): Seq[Set[String]] =
      df.queryExecution.optimizedPlan.collect { case j: Join => j }
        .map(rootsUnder)
    // SYMMETRIC case: `(fact ⋈ big) ⋈ X` with the top condition pairing
    // ONLY big with X — `(big ⋈ X) ⋈ fact` is the association that pulls
    // the selective composite inward
    def qSym() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(
        VersionedTable.read(spark, tiny)
          .join(VersionedTable.read(spark, tdim), col("tk") === col("dk")),
        col("bk2") === col("tk"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val onSym = qSym()
    assert(joins(onSym).contains(Set(big, tiny, tdim)),
      s"big must pair with the selective composite first:\n" +
        onSym.queryExecution.optimizedPlan)
    val gotSym = onSym.collect().map(_.toString).toSeq
    withRuleOff {
      val off = qSym()
      assert(!joins(off).contains(Set(big, tiny, tdim)))
      assert(off.collect().map(_.toString).toSeq == gotSym)
    }
    // CROSS-SPLIT proper: the top condition pairs big↔X AND fact↔X —
    // conjuncts place at their own levels, the smaller inner wins
    def qCross() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(
        VersionedTable.read(spark, tiny)
          .join(VersionedTable.read(spark, tdim), col("tk") === col("dk")),
        col("bk2") === col("tk") && col("k") === col("dd"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val onCross = qCross()
    assert(joins(onCross).contains(Set(big, tiny, tdim)),
      s"cross-split must still pull the composite inward:\n" +
        onCross.queryExecution.optimizedPlan)
    val gotCross = onCross.collect().map(_.toString).toSeq
    withRuleOff {
      val off = qCross()
      assert(!joins(off).contains(Set(big, tiny, tdim)))
      assert(off.collect().map(_.toString).toSeq == gotCross)
    }
    // IDEMPOTENCE: the rewritten spelling re-optimizes to itself (the
    // reverse swap would need the opposite ≥10× inequality)
    def qBest() = VersionedTable.read(spark, big)
      .join(
        VersionedTable.read(spark, tiny)
          .join(VersionedTable.read(spark, tdim), col("tk") === col("dk")),
        col("bk2") === col("tk"))
      .join(VersionedTable.read(spark, fact),
        col("k") === col("bk") && col("k") === col("dd"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val best = qBest()
    assert(joins(best).contains(Set(big, tiny, tdim)))
    assert(best.collect().map(_.toString).toSeq == gotCross)
    // RIGHT-NESTED cross-split: `tiny20 ⋈ (big ⋈ big2)` with the top
    // condition pairing tiny20 with BOTH inner legs — conjuncts split,
    // and the selective tiny20↔big pairing rotates inward past the
    // 1000-row big ⋈ big2
    val tiny20 = base + "/tiny20"; val big2 = base + "/big2"
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("t2k")), tiny20, statsCols = Seq("t2k"))
    VersionedTable.analyzeNdv(spark, tiny20, Seq("t2k"))
    VersionedTable.write(spark.range(0, 1000)
      .select(col("id").as("b2k")), big2, statsCols = Seq("b2k"))
    VersionedTable.analyzeNdv(spark, big2, Seq("b2k"))
    def qRot() = VersionedTable.read(spark, tiny20)
      .join(
        VersionedTable.read(spark, big)
          .join(VersionedTable.read(spark, big2), col("bk") === col("b2k")),
        col("t2k") === col("bk") && col("t2k") === col("b2k"))
      .agg(count(lit(1)).as("n"))
    val onRot = qRot()
    assert(joins(onRot).exists(s =>
      s == Set(tiny20, big) || s == Set(tiny20, big2)),
      s"a selective tiny20 pairing must rotate inward:\n" +
        onRot.queryExecution.optimizedPlan)
    val gotRot = onRot.collect().map(_.toString).toSeq
    withRuleOff {
      val off = qRot()
      assert(!joins(off).exists(s =>
        s == Set(tiny20, big) || s == Set(tiny20, big2)))
      assert(off.collect().map(_.toString).toSeq == gotRot)
    }
    // UNSKETCHABLE split declines: an un-analyzed second key on big —
    // no candidate has full sketch coverage, user order kept
    val bigNs = base + "/bigNs"
    VersionedTable.write(spark.range(0, 1000)
      .select(col("id").as("nk"), col("id").as("nk2")),
      bigNs, statsCols = Seq("nk", "nk2"))
    VersionedTable.analyzeNdv(spark, bigNs, Seq("nk")) // nk2 un-sketched
    def qNs() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, bigNs), col("k") === col("nk"))
      .join(
        VersionedTable.read(spark, tiny)
          .join(VersionedTable.read(spark, tdim), col("tk") === col("dk")),
        col("nk2") === col("tk"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val onNs = qNs()
    assert(!joins(onNs).contains(Set(bigNs, tiny, tdim)),
      "an un-sketched split key must keep the user's order")
    val gotNs = onNs.collect().map(_.toString).toSeq
    withRuleOff(assert(qNs().collect().map(_.toString).toSeq == gotNs))
  }

  test("declines: close call, outer arm, un-sketched key, filtered leg, B-touching cond") {
    val base = tmp()
    val fact = base + "/fact"; val big = base + "/big"
    val half = base + "/half"; val nosketch = base + "/ns"
    VersionedTable.write(spark.range(0, 20000)
      .select((col("id") % 1000).as("k"), col("id").as("v")),
      fact, statsCols = Seq("k"))
    VersionedTable.analyzeNdv(spark, fact, Seq("k"))
    VersionedTable.write(spark.range(0, 1000)
      .select(col("id").as("bk"), (col("id") % 7).as("bm")),
      big, statsCols = Seq("bk"))
    VersionedTable.analyzeNdv(spark, big, Seq("bk"))
    // 500 keys: est ratio only 2× — below the bar, user order kept
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 2 === 0)
      .select(col("id").as("hk")), half, statsCols = Seq("hk"))
    VersionedTable.analyzeNdv(spark, half, Seq("hk"))
    def qClose() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(VersionedTable.read(spark, half), col("k") === col("hk"))
      .agg(count(lit(1)).as("n"))
    assert(!pairedFirst(qClose(), fact, half),
      "a 2× estimate difference keeps the user's order")
    // un-sketched tiny key: no guess without a sketch
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("nk")), nosketch, statsCols = Seq("nk"))
    def qNs() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(VersionedTable.read(spark, nosketch), col("k") === col("nk"))
      .agg(count(lit(1)).as("n"))
    assert(!pairedFirst(qNs(), fact, nosketch))
    // LEFT outer second join: not associativity-safe — decline
    val tiny = base + "/tiny"
    VersionedTable.write(spark.range(0, 1000).filter(col("id") % 50 === 0)
      .select(col("id").as("tk")), tiny, statsCols = Seq("tk"))
    VersionedTable.analyzeNdv(spark, tiny, Seq("tk"))
    def qOuter() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(VersionedTable.read(spark, tiny), col("k") === col("tk"),
        "left")
      .agg(count(lit(1)).as("n"))
    val onOuter = qOuter()
    assert(!pairedFirst(onOuter, fact, tiny))
    val gotOuter = onOuter.collect().map(_.toString).toSeq
    withRuleOff(assert(qOuter().collect().map(_.toString).toSeq == gotOuter))
    // a filtered fact leg: surviving rows unknowable — decline
    def qFiltered() = VersionedTable.read(spark, fact)
      .filter(col("v") % 3 === 0)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(VersionedTable.read(spark, tiny), col("k") === col("tk"))
      .agg(count(lit(1)).as("n"))
    assert(!pairedFirst(qFiltered(), fact, tiny))
    // outer condition touching B: not associativity — decline
    def qTouch() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, big), col("k") === col("bk"))
      .join(VersionedTable.read(spark, tiny),
        col("k") === col("tk") && col("bm") =!= 99)
      .agg(count(lit(1)).as("n"))
    val onT = qTouch()
    assert(!pairedFirst(onT, fact, tiny))
    val gotT = onT.collect().map(_.toString).toSeq
    withRuleOff(assert(qTouch().collect().map(_.toString).toSeq == gotT))
  }
}
