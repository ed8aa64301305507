package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persistent TBLPROPERTIES in the commit log, and the three behaviors
  * they drive: CHECK constraints (write-time enforcement, the reference's
  * documented-but-unenforced data contracts), auto-compact (commit-time
  * small-file hygiene) and optimizeWrite (pre-write partition coalescing)
  * — reference/sql/ddl/01_bronze.sql:18-22, docs/data-contracts.md:76-88. */
class TablePropsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-props").toString + "/t"

  test("properties persist across commits, survive restore and vacuum re-anchor") {
    val p = tmp()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), p)               // v1
    VersionedTable.setProperties(spark, p, Map("graft.team" -> "ops"))    // v2
    assert(VersionedTable.propertiesOf(spark, p) == Map("graft.team" -> "ops"))
    // carried by every verb (append = delta manifest; compact = rewrite)
    (0 until 3).foreach(i =>
      VersionedTable.append(Seq((10L + i, "x")).toDF("id", "s"), p))      // v3-5
    VersionedTable.compact(spark, p)                                      // v6
    assert(VersionedTable.propertiesOf(spark, p) == Map("graft.team" -> "ops"))
    // unset is a commit too; RESTORE to a propertied version restores them
    VersionedTable.setProperties(spark, p, Map.empty, Seq("graft.team"))  // v7
    assert(VersionedTable.propertiesOf(spark, p).isEmpty)
    VersionedTable.restore(spark, p, 6L)                                  // v8
    assert(VersionedTable.propertiesOf(spark, p) == Map("graft.team" -> "ops"))
    // vacuum re-anchor re-encodes the oldest kept version: props intact
    VersionedTable.vacuum(spark, p, keepLast = 1, orphanRetentionMs = 0L)
    assert(VersionedTable.propertiesOf(spark, p) == Map("graft.team" -> "ops"))
    assert(VersionedTable.read(spark, p).count() == 4)
  }

  test("ADD CONSTRAINT validates existing rows; violating writes refused atomically") {
    val p = tmp()
    VersionedTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), p)
    // existing data violates → DDL refused, version unchanged
    val e0 = intercept[IllegalStateException] {
      VersionedTable.addCheckConstraint(spark, p, "v_big", "v > 15")
    }
    assert(e0.getMessage.contains("existing rows violate"), e0.getMessage)
    assert(VersionedTable.latestVersion(spark, p).contains(1L))

    VersionedTable.addCheckConstraint(spark, p, "v_pos", "v > 0")         // v2
    assert(VersionedTable.checkConstraintsOf(spark, p) == Map("v_pos" -> "v > 0"))

    // a violating append is refused ATOMICALLY: no commit, clean reads
    val e1 = intercept[IllegalStateException] {
      VersionedTable.append(Seq((3L, -1.0)).toDF("id", "v"), p)
    }
    assert(e1.getMessage.contains("v_pos"), e1.getMessage)
    assert(VersionedTable.latestVersion(spark, p).contains(2L))
    assert(VersionedTable.read(spark, p).count() == 2)

    // a valid append commits; a NULL predicate row passes (ANSI CHECK)
    VersionedTable.append(Seq((3L, 3.0)).toDF("id", "v"), p)              // v3
    VersionedTable.append(
      Seq((4L, Option.empty[Double])).toDF("id", "v"), p)                 // v4
    assert(VersionedTable.read(spark, p).count() == 4)

    // UPDATE that would break the constraint is refused; upsert likewise
    val e2 = intercept[IllegalStateException] {
      VersionedTable.update(spark, p, $"id" === 1, Map("v" -> lit(-5.0)))
    }
    assert(e2.getMessage.contains("v_pos"), e2.getMessage)
    val e3 = intercept[IllegalStateException] {
      VersionedTable.upsert(Seq((9L, -9.0)).toDF("id", "v"), p, Seq("id"))
    }
    assert(e3.getMessage.contains("v_pos"), e3.getMessage)
    assert(VersionedTable.latestVersion(spark, p).contains(4L))

    // DROP CONSTRAINT re-opens the gate
    VersionedTable.dropCheckConstraint(spark, p, "v_pos")                 // v5
    VersionedTable.append(Seq((5L, -1.0)).toDF("id", "v"), p)             // v6
    assert(VersionedTable.read(spark, p).count() == 5)
  }

  test("constraint hygiene: no property smuggling, no dropping referenced columns") {
    val p = tmp()
    VersionedTable.write(Seq((1L, -5.0)).toDF("id", "v"), p)
    // installing a constraint via raw SET TBLPROPERTIES would skip the
    // existing-row validation — refused, pointing at ADD CONSTRAINT
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.setProperties(spark, p, Map("graft.constraint.v_pos" -> "v > 0"))
    }
    assert(e1.getMessage.contains("ADD CONSTRAINT"), e1.getMessage)
    assert(VersionedTable.checkConstraintsOf(spark, p).isEmpty)
    // dropping a column a stored constraint references would brick every
    // later write with an unresolved-column error — refused at DDL time
    VersionedTable.update(spark, p, lit(true), Map("v" -> lit(5.0)))
    VersionedTable.addCheckConstraint(spark, p, "v_pos", "v > 0")
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.dropColumns(spark, p, Seq("v"))
    }
    assert(e2.getMessage.contains("v_pos"), e2.getMessage)
    VersionedTable.dropCheckConstraint(spark, p, "v_pos")
    VersionedTable.dropColumns(spark, p, Seq("v")) // now fine
    assert(VersionedTable.read(spark, p).columns.toSeq == Seq("id"))
  }

  test("malformed autoCompact threshold never fails a committed append") {
    val p = tmp()
    VersionedTable.write(Seq((1L, "d1")).toDF("id", "dt"), p,
      statsCols = Nil, partitionBy = Seq("dt"))
    VersionedTable.setProperties(spark, p, Map(
      "graft.autoCompact" -> "true",
      "graft.autoCompact.minFiles" -> "not-a-number"))
    // the hook swallows its own failure; the append itself must succeed
    val v = VersionedTable.append(Seq((2L, "d1")).toDF("id", "dt"), p)
    assert(v > 0 && VersionedTable.read(spark, p).count() == 2)
  }

  test("constraint checks never fire on rows the caller's own filters removed") {
    val p = tmp()
    VersionedTable.write(Seq((1L, 1.0)).toDF("id", "v"), p)
    VersionedTable.addCheckConstraint(spark, p, "v_pos", "v > 0")
    // the violating row is filtered OUT by the caller before the append;
    // the enforcement filter composes ABOVE it, and Catalyst's filter
    // split/pushdown must not evaluate the check on rows the user filter
    // removes (And conjuncts short-circuit left-to-right, inner first)
    val src = Seq((2L, 2.0, true), (3L, -3.0, false)).toDF("id", "v", "keep")
    VersionedTable.append(src.filter($"keep").select("id", "v"), p)
    assert(VersionedTable.read(spark, p).count() == 2)
  }

  test("UPDATE racing concurrent appends: optimistic retry, no lost rows") {
    val p = tmp()
    VersionedTable.write(
      (0 until 8).map(i => (i.toLong, 0.0)).toDF("id", "v"), p,
      statsCols = Seq("id"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val jobs = (0 until 4).map { w =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          gate.await()
          if (w % 2 == 0)
            VersionedTable.update(spark, p, col("id") === w.toLong,
              Map("v" -> lit(w + 1.0)))
          else VersionedTable.append(
            Seq((100L + w, -1.0)).toDF("id", "v"), p)
        }
      })
    }
    gate.countDown()
    val got = jobs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS)).sorted
    pool.shutdown()
    assert(got == Seq(2L, 3L, 4L, 5L), got) // four distinct versions, none lost
    val rows = VersionedTable.read(spark, p)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.size == 10) // 8 seeded + 2 appended
    assert(rows(0L) == 1.0 && rows(2L) == 3.0, rows) // both updates landed
    assert(rows(101L) == -1.0 && rows(103L) == -1.0)
  }

  test("constraints bind the exactly-once streaming commit path too") {
    val p = tmp()
    VersionedTable.write(Seq((1L, 5.0)).toDF("id", "v"), p)
    VersionedTable.addCheckConstraint(spark, p, "v_pos", "v > 0")
    // a valid micro-batch commits with its txn watermark
    VersionedTable.commitBatch(Seq((2L, 2.0)).toDF("id", "v"), p, "appX", 0L)
    assert(VersionedTable.latestVersion(spark, p).contains(3L))
    // a violating micro-batch is refused atomically: no version, and the
    // txn watermark does NOT advance — a corrected retry of the SAME
    // batch id still commits (refusal must not burn the batch)
    val e = intercept[IllegalStateException] {
      VersionedTable.commitBatch(Seq((3L, -1.0)).toDF("id", "v"), p, "appX", 1L)
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(VersionedTable.latestVersion(spark, p).contains(3L))
    VersionedTable.commitBatch(Seq((3L, 3.0)).toDF("id", "v"), p, "appX", 1L)
    assert(VersionedTable.read(spark, p).count() == 3)
  }

  test("autoCompact converges streaming-style appends to a bounded file count") {
    val p = tmp()
    val pOff = tmp()
    def seed(path: String, props: Map[String, String]): Unit = {
      VersionedTable.write(
        Seq((0L, "d1"), (1L, "d2")).toDF("id", "dt"), path,
        statsCols = Nil, partitionBy = Seq("dt"))
      if (props.nonEmpty) VersionedTable.setProperties(spark, path, props)
    }
    seed(p, Map("graft.autoCompact" -> "true",
      "graft.autoCompact.minFiles" -> "4"))
    seed(pOff, Map.empty)
    (0 until 10).foreach { i =>
      val batch = Seq((100L + i, "d1"), (200L + i, "d2")).toDF("id", "dt")
      VersionedTable.append(batch, p)
      VersionedTable.append(batch, pOff)
    }
    def filesPerDir(path: String): Map[String, Int] = {
      val v = VersionedTable.latestVersion(spark, path).get
      VersionedTable.filesOf(spark, path, v)
        .groupBy(r => r.split('/')(1)).map { case (d, fs) => d -> fs.size }
    }
    // without the property the per-dir count grows with every append;
    // with it, each dir is bin-packed whenever it reaches minFiles
    assert(filesPerDir(pOff).values.forall(_ == 11), filesPerDir(pOff))
    assert(filesPerDir(p).values.forall(_ < 6), filesPerDir(p))
    // hygiene is invisible in results
    assert(VersionedTable.read(spark, p).collect().map(_.toString).toSet ==
      VersionedTable.read(spark, pOff).collect().map(_.toString).toSet)
  }

  test("autoCompact also converges a MERGE-maintained (streaming upsert sink) table") {
    val p = tmp()
    VersionedTable.write(Seq((0L, 0.0)).toDF("id", "v"), p, statsCols = Seq("id"))
    VersionedTable.setProperties(spark, p, Map(
      "graft.autoCompact" -> "true", "graft.autoCompact.minFiles" -> "4"))
    (1 to 10).foreach { i => // each micro-merge inserts a fresh key
      VersionedTable.upsert(Seq((i.toLong, i.toDouble)).toDF("id", "v"), p, Seq("id"))
    }
    val head = VersionedTable.latestVersion(spark, p).get
    assert(VersionedTable.filesOf(spark, p, head).size < 6,
      VersionedTable.filesOf(spark, p, head).mkString(","))
    assert(VersionedTable.read(spark, p).count() == 11)
  }

  test("optimizeWrite writes one file per touched partition dir per commit") {
    val p = tmp()
    VersionedTable.write(Seq((0L, "d1"), (1L, "d2")).toDF("id", "dt"), p,
      statsCols = Nil, partitionBy = Seq("dt"))
    VersionedTable.setProperties(spark, p, Map("graft.optimizeWrite" -> "true"))
    // 8 input partitions × 2 dirs would stage up to 16 files; the
    // property coalesces to one per dir
    val batch = (0 until 64).map(i => (10L + i, if (i % 2 == 0) "d1" else "d2"))
      .toDF("id", "dt").repartition(8)
    val v = VersionedTable.append(batch, p)
    val newFiles = VersionedTable.filesOf(spark, p, v)
      .diff(VersionedTable.filesOf(spark, p, v - 1))
    assert(newFiles.size == 2, s"expected 1 file per dir, got: $newFiles")
    assert(VersionedTable.read(spark, p).count() == 66)
  }
}
