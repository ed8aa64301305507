package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  test("write/read/time-travel across versions") {
    val path = java.nio.file.Files.createTempDirectory("vt").toString + "/t"
    assert(VersionedTable.versions(spark, path).isEmpty)
    val v1 = VersionedTable.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    val v2 = VersionedTable.write(Seq((1, "a"), (2, "B"), (3, "c")).toDF("id", "v"), path)
    assert((v1, v2) == (1L, 2L))
    assert(VersionedTable.read(spark, path).count() == 3)           // latest
    assert(VersionedTable.read(spark, path, Some(1L)).count() == 2) // time travel
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, Some(9L))
    }
  }

  test("a committed version that nets to zero rows stays readable (manifest schema)") {
    val path = java.nio.file.Files.createTempDirectory("vt").toString + "/t"
    VersionedTable.write(Seq((1, "a")).toDF("id", "v"), path)
    val empty = Seq((1, "a")).toDF("id", "v").filter(lit(false))
    val v2 = VersionedTable.write(empty, path)
    val got = VersionedTable.read(spark, path, Some(v2))
    assert(got.count() == 0)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("concurrent writers: every commit wins a distinct version, none are lost") {
    val path = java.nio.file.Files.createTempDirectory("vt").toString + "/t"
    val writers = 4
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    import scala.jdk.CollectionConverters._
    val futures = (1 to writers).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await()
          VersionedTable.write(Seq((i, s"w$i")).toDF("id", "v"), path)
        }
      })
    }
    gate.countDown()
    val got = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS)).sorted
    pool.shutdown()
    assert(got == (1L to writers.toLong), got.toString) // contiguous, all distinct
    assert(VersionedTable.versions(spark, path) == (1L to writers.toLong))
    // every version is readable and carries exactly its writer's snapshot
    val snapshots = (1L to writers.toLong).map(v =>
      VersionedTable.read(spark, path, Some(v)).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet)
    assert(snapshots.toSet == (1 to writers).map(i => Set((i, s"w$i"))).toSet)
  }

  test("concurrent upserts: optimistic retry means no lost update") {
    val path = java.nio.file.Files.createTempDirectory("vt").toString + "/t"
    VersionedTable.write(Seq((0, "base")).toDF("id", "v"), path)
    val writers = 4
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val futures = (1 to writers).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await()
          VersionedTable.upsert(Seq((i, s"u$i")).toDF("id", "v"), path, Seq("id"))
        }
      })
    }
    gate.countDown()
    val got = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS)).sorted
    pool.shutdown()
    assert(got == (2L to (writers + 1).toLong), got.toString)
    // the final head contains the base row AND all four upserts — a lost
    // race recomputed its merge instead of clobbering the other writer
    val head = VersionedTable.read(spark, path).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(head == (Set((0, "base")) ++ (1 to writers).map(i => (i, s"u$i"))), head.toString)
  }

  test("change feed tags inserts and deletes between versions") {
    val path = java.nio.file.Files.createTempDirectory("vt").toString + "/t"
    VersionedTable.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    VersionedTable.write(Seq((1, "a"), (2, "B"), (3, "c")).toDF("id", "v"), path)
    val ch = VersionedTable.changes(spark, path, 1L, 2L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    // unchanged (1,a) absent; update = delete old + insert new
    assert(ch == Set((2, "B", "insert"), (3, "c", "insert"), (2, "b", "delete")))
  }

  test("upsert replaces matched keys, appends new ones, and keeps history") {
    val path = java.nio.file.Files.createTempDirectory("vt").toString + "/t"
    VersionedTable.upsert(Seq((1, "a"), (2, "b")).toDF("id", "v"), path, Seq("id"))
    val v2 = VersionedTable.upsert(Seq((2, "B2"), (3, "c")).toDF("id", "v"), path, Seq("id"))
    assert(v2 == 2L)
    val now = VersionedTable.read(spark, path)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(now == Set((1, "a"), (2, "B2"), (3, "c")))
    // pre-merge snapshot still served by time travel
    val before = VersionedTable.read(spark, path, Some(1L))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(before == Set((1, "a"), (2, "b")))
  }

  test("upsert with schema evolution keeps new columns, null-fills old rows") {
    val path = java.nio.file.Files.createTempDirectory("vt").toString + "/t"
    VersionedTable.upsert(Seq((1, "a")).toDF("id", "v"), path, Seq("id"))
    // new batch carries an extra column
    VersionedTable.upsert(
      Seq((2, "b", "extra")).toDF("id", "v", "tag"), path, Seq("id"),
      evolveSchema = true)
    val now = VersionedTable.read(spark, path).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.getString(2)))).toSeq
    assert(now == Seq((1, "a", None), (2, "b", Some("extra"))), now.toString)
    // pre-evolution version still time-travels with ITS recorded schema —
    // the manifest pins schema per version, so widening the head never
    // rewrites history
    val v1 = VersionedTable.read(spark, path, Some(1L))
    assert(v1.schema.fieldNames.toSeq == Seq("id", "v"), v1.schema.treeString)
    assert(v1.count() == 1)
    // change feed across the evolution aligns columns (missing side = null)
    val ch = VersionedTable.changes(spark, path, 1L, 2L).collect()
      .map(r => (r.getAs[Int]("id"), Option(r.getAs[String]("tag")),
        r.getAs[String]("_change_type"))).toSet
    assert(ch == Set((2, Some("extra"), "insert")), ch.toString)
    // without evolution, mismatched schemas must fail loudly
    intercept[Exception] {
      VersionedTable.upsert(
        Seq((3, "c", 1.0)).toDF("id", "v", "other"), path, Seq("id"))
    }
  }

  test("compaction rewrites many small files into few, atomically") {
    import graft.sources.TableIO
    val path = java.nio.file.Files.createTempDirectory("cmp").toString + "/t"
    TableIO.write((1 to 10000).toDF("x").repartition(64), path)
    def nParquet = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nParquet == 64)
    TableIO.compact(spark, path, targetFileBytes = 1L << 30)
    assert(nParquet == 1, nParquet.toString)
    assert(TableIO.read(spark, path).count() == 10000)
  }

  test("a failed version write never becomes readable; vacuum retires old versions") {
    val path = java.nio.file.Files.createTempDirectory("vt").toString + "/t"
    VersionedTable.write(Seq((1, "a")).toDF("id", "v"), path)
    val bad = Seq(1, 2).toDF("id")
      .withColumn("v", when(col("id") > 1, raise_error(lit("boom"))).otherwise(lit("x")))
    intercept[Exception] { VersionedTable.write(bad, path) }
    // failed v2 left no manifest → invisible to readers
    assert(VersionedTable.versions(spark, path) == Seq(1L))
    assert(VersionedTable.read(spark, path).count() == 1)
    // next writer claims the next free number and commits fine
    val v = VersionedTable.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    assert(v >= 2L && VersionedTable.read(spark, path).count() == 2)

    VersionedTable.vacuum(spark, path, keepLast = 1)
    assert(VersionedTable.versions(spark, path) == Seq(v))
    assert(VersionedTable.read(spark, path).count() == 2)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, Some(1L))
    }
  }

  test("vacuum retention floor protects in-flight stage dirs; sweeps stale commit tmps") {
    val path = java.nio.file.Files.createTempDirectory("vt").toString + "/t"
    VersionedTable.write(Seq((1, "a")).toDF("id", "v"), path)
    // simulate a slow writer: a staged-but-uncommitted data dir that existed
    // BEFORE the next commit lands (the ADVICE scenario: under the old
    // commit-time-only rule it looks older than every kept manifest)
    val orphan = new java.io.File(path, "d-inflight")
    orphan.mkdirs()
    new java.io.FileOutputStream(new java.io.File(orphan, "part-0.parquet")).close()
    // and a dead writer's manifest stage file
    val tmp = new java.io.File(path, ".commit-deadbeef.tmp")
    new java.io.FileOutputStream(tmp).close()
    Thread.sleep(20)
    VersionedTable.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    // default retention: both younger than the 24h floor → untouched, even
    // though a newer commit makes them older than the oldest kept manifest
    VersionedTable.vacuum(spark, path, keepLast = 1)
    assert(orphan.exists(), "retention floor must protect a fresh staged dir")
    assert(tmp.exists())
    // zero retention: now both are sweepable (older than the kept commit)
    VersionedTable.vacuum(spark, path, keepLast = 1, orphanRetentionMs = 0L)
    assert(!orphan.exists(), "zero-retention vacuum must sweep the orphan")
    assert(!tmp.exists(), "zero-retention vacuum must sweep stale commit tmps")
    assert(VersionedTable.read(spark, path).count() == 2)
  }
}
