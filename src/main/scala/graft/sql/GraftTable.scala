package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.VersionedTable

/** DataSource V2 [[Table]] over a graft versioned table — the SQL-surface
  * identity of what `spark.read.format("graft-table")` reads. Loaded by
  * [[GraftCatalog]], so `SELECT ... FROM graft.`/path/to/table`` resolves,
  * including `VERSION AS OF` / `TIMESTAMP AS OF` (the catalog's time-travel
  * `loadTable` overloads produce a pinned `asOf`).
  *
  * READS are normally never planned through this class: the
  * [[GraftExtensions]] analysis rule swaps the V2 relation for the proven V1
  * `HadoopFsRelation` path (plan-time manifest skipping, DV + column mapping
  * inside the scan, vectorized parquet + whole-stage codegen — the same
  * relation the `format("graft-table")` batch read builds). The
  * [[V1Scan]] fallback below only serves sessions that registered the
  * catalog without the extensions; it is row-based and unpruned, correct but
  * slow, and exists so a misconfigured session degrades instead of failing.
  *
  * WRITES go through the V1 write fallback ([[TableCapability.V1_BATCH_WRITE]]):
  * `INSERT INTO` appends a version, `INSERT OVERWRITE` commits a
  * full-snapshot version — both land as atomic commits on the versioned log
  * (the reference's tables are maintained by exactly these SQL verbs,
  * reference/sql/ddl/01_bronze.sql:8-26).
  */
class GraftTable(
    spark: SparkSession,
    val path: String,
    val asOf: Option[Long]) extends Table with SupportsRead with SupportsWrite {

  /** The batch relation for this snapshot (shared by schema resolution and
    * the conversion rule, so the manifest is resolved once per query). */
  lazy val relation: BaseRelation = VersionedTable.batchRelation(spark, path, asOf)

  override def name(): String =
    s"graft.`$path`" + asOf.map(v => s" VERSION AS OF $v").getOrElse("")

  override def schema(): StructType = relation.schema

  /** The table's partition dimension (identity transforms), recovered from
    * the recorded schema's partition metadata — DESCRIBE shows it, CREATE
    * TABLE ... PARTITIONED BY round-trips it. */
  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] =
    VersionedTable.partitionColsOf(schema())
      .map(org.apache.spark.sql.connector.expressions.Expressions.identity)
      .toArray

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  /** Stored TBLPROPERTIES resolved ONCE per table handle (a handle pins a
    * snapshot; properties()/constraints() are called several times per
    * statement and each uncached read walks the manifest chain). */
  private lazy val storedProps: Map[String, String] =
    VersionedTable.propertiesOf(spark, path, asOf)

  /** The table's stored CHECK constraints, surfaced to the DSv2 layer
    * (DESCRIBE shows them; enforcement itself lives in the write verbs —
    * the V1 write fallback routes every SQL INSERT through them). */
  override def constraints(): Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    storedProps.collect {
      case (k, sql) if k.startsWith("graft.constraint.") =>
        k.stripPrefix("graft.constraint.") -> sql
    }.toSeq.sortBy(_._1)
      .map { case (name, sql) =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(name).predicateSql(sql).build()
          : org.apache.spark.sql.connector.catalog.constraints.Constraint
      }.toArray

  override def properties(): util.Map[String, String] = {
    // stored props first, ENGINE values second: a user property named
    // 'provider'/'location' must not override what Spark reads
    val base = storedProps ++
      Map("provider" -> "graft-table", "location" -> path)
    (asOf match {
      case Some(v) => base + ("versionAsOf" -> v.toString)
      case None => base
    }).asJava
  }

  /** Correct-but-slow fallback for sessions without [[GraftExtensions]]:
    * a V1 TableScan over the public read API (row-based RDD bridge, no
    * plan-time pruning). The extensions' conversion rule replaces the V2
    * relation before this is ever built. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema()
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T = {
          val outer = this
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = outer.readSchema()
            override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
              VersionedTable.read(spark, path, asOf).rdd
          }
        }.asInstanceOf[T]
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty,
      s"$path: cannot write to a time-travelled snapshot (VERSION AS OF $asOf)")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteArg: Boolean): Unit =
              if (overwrite || overwriteArg) VersionedTable.write(data, path)
              // append with no explicit statsCols inherits the parent
              // manifest's stats columns — SQL-maintained tables keep
              // their data-skipping reads
              else VersionedTable.append(data, path)
          }
      }
    }
  }
}
