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
}
