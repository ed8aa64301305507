package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Row tracking: stable row identity through copy-on-write rewrites, and
  * the row-keyed change feed built on it. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("rt").toString + "/t"

  /** key → tracked row id of the latest version. */
  private def idsOf(path: String, asOf: Option[Long] = None): Map[Long, Long] =
    VersionedTable.readWithRowIds(spark, path, asOf)
      .select(col("id"), col(VersionedTable.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def tracked(path: String): Long =
    VersionedTable.setProperties(spark, path,
      Map(VersionedTable.RowTrackingKey -> "true"))

  test("enable backfills ids; appends mint monotonically; reads refuse untracked") {
    val p = tmp()
    VersionedTable.write((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"), p)
    intercept[IllegalArgumentException] {
      VersionedTable.readWithRowIds(spark, p)
    }
    tracked(p) // property commit assigns ids to the existing files
    val first = idsOf(p)
    assert(first.size == 5 && first.values.toSet.size == 5,
      s"ids must be unique: $first")
    assert(VersionedTable.rowIdHighWatermark(spark, p).contains(5L))
    VersionedTable.append((6L to 8L).map(i => (i, s"v$i")).toDF("id", "s"), p)
    val after = idsOf(p)
    assert((1L to 5L).forall(k => after(k) == first(k)),
      "append must not disturb existing ids")
    assert((6L to 8L).forall(k => after(k) >= 5L), s"fresh ids from the hwm: $after")
    assert(VersionedTable.rowIdHighWatermark(spark, p).contains(8L))
  }

  test("OPTIMIZE and ZORDER rewrite bytes but not identity; row-keyed CDF is empty") {
    val p = tmp()
    VersionedTable.write((1L to 4L).map(i => (i, s"a$i")).toDF("id", "s"), p)
    tracked(p)
    VersionedTable.append((5L to 8L).map(i => (i, s"a$i")).toDF("id", "s"), p)
    VersionedTable.append((9L to 12L).map(i => (i, s"a$i")).toDF("id", "s"), p)
    val before = idsOf(p)
    val vPre = VersionedTable.latestVersion(spark, p).get
    val vOpt = VersionedTable.compact(spark, p)
    assert(vOpt > vPre, "three small files must actually bin-pack")
    assert(idsOf(p) == before, "compaction must preserve every row id")
    assert(VersionedTable.changesWithRowIds(spark, p, vPre, vOpt).isEmpty,
      "OPTIMIZE must emit ZERO row changes under the row-keyed feed")
    val vZ = VersionedTable.zOrderBy(spark, p, Seq("id"), bits = 8)
    assert(idsOf(p) == before, "zorder must preserve every row id")
    assert(VersionedTable.changesWithRowIds(spark, p, vOpt, vZ).isEmpty)
    // the value-level feed agrees (multiset diff cancels identical rows)
    assert(VersionedTable.changes(spark, p, vPre, vZ).isEmpty)
  }

  test("MERGE keeps matched ids and emits only genuinely-changed rows") {
    val p = tmp()
    VersionedTable.write((1L to 6L).map(i => (i, s"a$i")).toDF("id", "s"), p,
      statsCols = Seq("id"))
    tracked(p)
    val before = idsOf(p)
    val vPre = VersionedTable.latestVersion(spark, p).get
    val vM = VersionedTable.upsert(
      Seq((2L, "CHANGED"), (99L, "new")).toDF("id", "s"), p, Seq("id"))
    val after = idsOf(p)
    assert(after(2L) == before(2L), "a MERGE-matched row keeps its id")
    assert((1L to 6L).filter(_ != 2L).forall(k => after(k) == before(k)),
      "untouched rows of the rewritten file keep their ids")
    assert(after(99L) >= 6L, "the insert draws a fresh id")
    val cdf = VersionedTable.changesWithRowIds(spark, p, vPre, vM)
      .select(col("id"), col("s"), col(VersionedTable.RowIdCol),
        col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(cdf.length == 3, s"only changed rows may appear: ${cdf.mkString("; ")}")
    assert(cdf.contains((2L, "a2", before(2L), "update_preimage")))
    assert(cdf.contains((2L, "CHANGED", before(2L), "update_postimage")))
    assert(cdf.contains((99L, "new", after(99L), "insert")))
  }

  test("UPDATE keeps identity; DELETE retires it; both classified by the feed") {
    val p = tmp()
    VersionedTable.write((1L to 5L).map(i => (i, s"a$i")).toDF("id", "s"), p,
      statsCols = Seq("id"))
    tracked(p)
    val before = idsOf(p)
    val v0 = VersionedTable.latestVersion(spark, p).get
    val vU = VersionedTable.update(spark, p, col("id") === 3L,
      Map("s" -> lit("upd")))
    assert(idsOf(p)(3L) == before(3L), "UPDATE preserves the row id")
    val u = VersionedTable.changesWithRowIds(spark, p, v0, vU)
      .select(col("_change_type")).collect().map(_.getString(0)).sorted
    assert(u.toSeq == Seq("update_postimage", "update_preimage"), u.mkString(","))
    val vD = VersionedTable.delete(spark, p, col("id") === 1L)
    val d = VersionedTable.changesWithRowIds(spark, p, vU, vD)
      .select(col("id"), col(VersionedTable.RowIdCol), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(d.toSeq == Seq((1L, before(1L), "delete")), d.mkString(","))
  }

  test("restore and clone carry row identity verbatim") {
    val p = tmp()
    VersionedTable.write((1L to 4L).map(i => (i, s"a$i")).toDF("id", "s"), p,
      statsCols = Seq("id"))
    tracked(p)
    val orig = idsOf(p)
    val vT = VersionedTable.latestVersion(spark, p).get
    VersionedTable.update(spark, p, col("id") === 2L, Map("s" -> lit("x")))
    VersionedTable.restore(spark, p, vT)
    assert(idsOf(p) == orig, "restore re-publishes the ids the target held")
    val dst = tmp()
    VersionedTable.cloneTo(spark, p, dst)
    assert(idsOf(dst) == orig, "a clone of the same files keeps the same ids")
  }

  test("graft_row_changes TVF serves the row-keyed feed from SQL") {
    val p = tmp()
    VersionedTable.write((1L to 4L).map(i => (i, s"a$i")).toDF("id", "s"), p,
      statsCols = Seq("id"))
    tracked(p)
    val v0 = VersionedTable.latestVersion(spark, p).get
    val vU = VersionedTable.update(spark, p, col("id") === 2L,
      Map("s" -> lit("sql")))
    val viaSql = spark.sql(
      s"SELECT id, s, _change_type FROM graft_row_changes('$p', $v0, $vU)")
      .collect().map(_.toString).sorted
    val viaApi = VersionedTable.changesWithRowIds(spark, p, v0, vU)
      .select(col("id"), col("s"), col("_change_type"))
      .collect().map(_.toString).sorted
    assert(viaSql.sameElements(viaApi) && viaSql.length == 2)
    // fromV = 0 is the initial load: snapshot as inserts, ids riding
    val initial = spark.sql(
      s"SELECT * FROM graft_row_changes('$p', 0, $vU)").collect()
    assert(initial.length == 4 &&
      initial.forall(_.getAs[String]("_change_type") == "insert"))
  }

  test("readRowChanges: the row-keyed feed through the batch format surface") {
    val p = tmp()
    VersionedTable.write((1L to 4L).map(i => (i, s"a$i")).toDF("id", "s"), p,
      statsCols = Seq("id"))
    tracked(p)
    val v0 = VersionedTable.latestVersion(spark, p).get
    val vU = VersionedTable.update(spark, p, col("id") === 3L,
      Map("s" -> lit("fmt")))
    val viaFormat = spark.read.format("graft-table")
      .option("readRowChanges", "true")
      .option("startingVersion", v0.toString)
      .option("endingVersion", vU.toString)
      .load(p)
      .select(col("id"), col("s"), col("_change_type"))
      .collect().map(_.toString).sorted
    val viaApi = VersionedTable.changesWithRowIds(spark, p, v0, vU)
      .select(col("id"), col("s"), col("_change_type"))
      .collect().map(_.toString).sorted
    assert(viaFormat.sameElements(viaApi) && viaFormat.length == 2)
  }

  test("streaming readRowChanges: snapshot with ids, then update pairs under one id") {
    val p = tmp()
    VersionedTable.write((1L to 3L).map(i => (i, s"a$i")).toDF("id", "s")
      .coalesce(1), p, statsCols = Seq("id"))
    tracked(p) // v2 — the unthrottled initial load lands at-or-after this
    val ids = idsOf(p)
    val q = spark.readStream.format("graft-table")
      .option("readRowChanges", "true")
      .load(p)
      .writeStream.format("memory").queryName("row_cdf_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      VersionedTable.update(spark, p, col("id") === 2L, Map("s" -> lit("U")))
      q.processAllAvailable()
    } finally q.stop()
    while (spark.streams.active.nonEmpty) Thread.sleep(50)
    val got = spark.table("row_cdf_out")
      .select(col("id"), col("s"), col(VersionedTable.RowIdCol),
        col("_change_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    val expected = Seq(
      (1L, "a1", ids(1L), "insert"), (2L, "a2", ids(2L), "insert"),
      (3L, "a3", ids(3L), "insert"),
      // the CoW rewrite of the whole file emits ONLY the changed row,
      // paired under its surviving id — rows 1 and 3 collapse
      (2L, "a2", ids(2L), "update_preimage"),
      (2L, "U", ids(2L), "update_postimage")).sorted
    assert(got == expected, got.mkString("\n"))
  }

  test("reserved-name schemas refuse; map-column tables classify via JSON compare") {
    val p = tmp()
    VersionedTable.write(Seq((1L, "x")).toDF("id", VersionedTable.RowIdCol), p)
    intercept[IllegalArgumentException] { tracked(p) }
    // maps are unorderable in Spark — the row-keyed feed must still pair
    // updates (it falls back to comparing the sides' JSON renderings)
    val pm = tmp()
    VersionedTable.write(
      Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2))).toDF("id", "m"), pm,
      statsCols = Seq("id"))
    tracked(pm)
    val v0 = VersionedTable.latestVersion(spark, pm).get
    val vU = VersionedTable.update(spark, pm, col("id") === 2L,
      Map("m" -> map(lit("b"), lit(9))))
    val got = VersionedTable.changesWithRowIds(spark, pm, v0, vU)
      .select(col("id"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq ==
      Seq((2L, "update_postimage"), (2L, "update_preimage")), got.mkString(","))
  }

  test("DESCRIBE DETAIL and the protocol surface the feature") {
    val p = tmp()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), p)
    tracked(p)
    val (_, wf) = VersionedTable.protocolOf(spark, p)
    assert(wf.contains("rowtracking"),
      "mutators on a build without the feature must be fenced by wf")
    val d = spark.sql(
      s"DESCRIBE DETAIL graft.`$p`").collect().head
    assert(d.getAs[Boolean]("row_tracking"))
    assert(d.getAs[Long]("row_id_high_watermark") == 1L)
  }
}
