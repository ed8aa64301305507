package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.VersionedTable

/** Path-based SQL catalog for graft versioned tables, Delta's
  * `delta.`/path/to/table`` idiom:
  *
  * {{{
  *   spark.sql.catalog.graft = graft.sql.GraftCatalog   // session conf
  *
  *   SELECT * FROM graft.`/data/events`
  *   SELECT * FROM graft.`/data/events` VERSION AS OF 3
  *   SELECT * FROM graft.`/data/events` TIMESTAMP AS OF '2026-01-01'
  *   INSERT INTO graft.`/data/events` SELECT ...
  *   INSERT OVERWRITE graft.`/data/events` SELECT ...
  *   CREATE TABLE graft.`/data/new` (id BIGINT, v DOUBLE)
  *   ALTER TABLE graft.`/data/new` ADD COLUMNS (w STRING)
  *   MERGE INTO graft.`/data/new` t USING u ON t.id = u.id
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * The identifier IS the table path (an empty namespace), so there is no
  * metastore state to administer or drift: the commit log at the path is the
  * single source of truth, exactly as in the DataFrame API. The reference
  * ships its whole contract as SQL DDL over named tables
  * (reference/sql/ddl/02_silver_events.sql:8-61); this catalog is how that
  * surface reaches graft tables.
  *
  * Time travel: `VERSION AS OF n` resolves through `loadTable(ident, n)`;
  * `TIMESTAMP AS OF ts` through `loadTable(ident, micros)` →
  * [[VersionedTable.versionAt]] (latest version committed at or before ts).
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = "graft"
  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** `graft.`/a/b`` parses to namespace=[] name="/a/b"; a dotted
    * multi-part identifier would be a metastore name, which this catalog
    * deliberately doesn't keep. */
  private def pathOf(ident: Identifier): String = {
    require(ident.namespace.isEmpty,
      s"graft catalog identifies tables by path — use $catalogName.`/path/to/table`, " +
        s"not a namespaced name (got ${ident.namespace.mkString(".")}.${ident.name})")
    ident.name
  }

  /** Declares CHECK-constraint DDL support so Spark's parser-level
    * `ALTER TABLE ... ADD CONSTRAINT ... CHECK` routes here, and
    * generated-column DDL so `CREATE TABLE ... (c T GENERATED ALWAYS AS
    * (expr))` hands the expression through field metadata. */
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  override def tableExists(ident: Identifier): Boolean =
    VersionedTable.latestVersion(spark, pathOf(ident)).isDefined

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    if (VersionedTable.latestVersion(spark, path).isEmpty)
      throw new NoSuchTableException(ident)
    new GraftTable(spark, path, asOf = None)
  }

  /** `VERSION AS OF <v>`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    val v = scala.util.Try(version.trim.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"$path: VERSION AS OF takes a version number, got '$version'"))
    if (VersionedTable.latestVersion(spark, path).isEmpty)
      throw new NoSuchTableException(ident)
    new GraftTable(spark, path, asOf = Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    val v = VersionedTable.versionAt(spark, path, timestamp / 1000L).getOrElse(
      throw new NoSuchTableException(ident))
    new GraftTable(spark, path, asOf = Some(v))
  }

  /** `CREATE TABLE graft.`/path`` (cols)`: commits version 1 with the
    * declared schema and zero rows — refused atomically if any version
    * already exists (decided inside the commit CAS loop, never
    * check-then-act). `TBLPROPERTIES ('statsCols'='a,b')` seeds per-file
    * min/max stats collection; `PARTITIONED BY (col)` declares the
    * partition layout dimension. */
  /** The Column[]-based entry Spark actually calls for SQL CREATE TABLE:
    * `GENERATED ALWAYS AS` rides `Column.generationExpression()` and the
    * default Column→StructType bridge DROPS it — re-attach each expression
    * as field metadata so the schema-based path below lifts it into the
    * commit-log property contract. */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    import org.apache.spark.sql.catalyst.util.GeneratedColumn
    val withGen = StructType(columns.map { c =>
      require(c.defaultValue() == null,
        s"${pathOf(ident)}: DEFAULT values are not supported (column ${c.name})")
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      Option(c.comment()).foreach(mb.putString("comment", _))
      Option(c.generationExpression()).foreach(
        mb.putString(GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY, _))
      org.apache.spark.sql.types.StructField(
        c.name, c.dataType, c.nullable, mb.build())
    })
    // GENERATED {ALWAYS|BY DEFAULT} AS IDENTITY → validated here (the
    // table is empty by construction at CREATE — exactly when Delta allows
    // identity) and handed down as FIELD METADATA like generation, never
    // through the user-properties map (which refuses those keys below)
    val withId = StructType(withGen.fields.zip(columns).map { case (fl, c) =>
      Option(c.identityColumnSpec()) match {
        case Some(sp) =>
          require(c.dataType == org.apache.spark.sql.types.LongType,
            s"${pathOf(ident)}: identity column ${c.name} must be BIGINT " +
              s"(got ${c.dataType.simpleString})")
          require(sp.getStep != 0L,
            s"${pathOf(ident)}: identity step must be non-zero (${c.name})")
          require(c.generationExpression() == null,
            s"${pathOf(ident)}: ${c.name} cannot be both generated and identity")
          fl.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(fl.metadata)
            .putString(GraftCatalog.IdentitySpecMetadataKey,
              s"start=${sp.getStart};step=${sp.getStep};" +
                s"explicit=${sp.isAllowExplicitInsert}")
            .build())
        case None => fl
      }
    })
    createTable(ident, withId, partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val path = pathOf(ident)
    val props = properties.asScala
    val statsCols = props.get("statsCols").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    // CLUSTERED BY (cols) [SORTED BY (cols)] INTO n BUCKETS arrives as a
    // bucket transform — lift it into the graft bucket-layout properties
    // (VersionedTable stages every file through the bucket shuffle and
    // the read relation declares the BucketSpec, sort columns included;
    // the sorted-scan ORDERING report is gated behind the one-file-per-
    // bucket invariant — see VersionedTable.BucketSortByKey).
    val (bucketTrans, partTrans) = partitions.toSeq.partition(t =>
      org.apache.spark.sql.graft.GraftBatchShim.bucketTransformInfo(t).isDefined)
    val bucketProps: Map[String, String] = bucketTrans match {
      case Nil => Map.empty
      case Seq(bt) =>
        val (n, cols, sortCols) =
          org.apache.spark.sql.graft.GraftBatchShim.bucketTransformInfo(bt).get
        Map(VersionedTable.BucketByKey -> cols.mkString(","),
          VersionedTable.NumBucketsKey -> n.toString) ++
          (if (sortCols.isEmpty) Map.empty
           else Map(VersionedTable.BucketSortByKey -> sortCols.mkString(",")))
      case ts => throw new IllegalArgumentException(
        s"$path: unsupported bucket transform(s): ${ts.mkString(", ")}")
    }
    bucketProps.foreach { case (k, v) =>
      props.get(k).foreach(pv => require(pv == v,
        s"$path: TBLPROPERTIES $k='$pv' conflicts with CLUSTERED BY ($v)"))
    }
    (bucketProps.get(VersionedTable.BucketByKey) ++
        bucketProps.get(VersionedTable.BucketSortByKey)).foreach { bc =>
      val missing = bc.split(",").filterNot(schema.fieldNames.contains)
      require(missing.isEmpty,
        s"$path: CLUSTERED/SORTED BY column(s) not in the schema: ${missing.mkString(",")}")
    }
    val partitionCols = partTrans.map { t =>
      val refs = t.references()
      require(t.name == "identity" && refs.length == 1 && refs(0).fieldNames.length == 1,
        s"$path: only identity partition transforms on top-level columns are " +
          s"supported (got $t)")
      refs(0).fieldNames()(0)
    }
    require(bucketProps.isEmpty || partitionCols.isEmpty,
      s"$path: CLUSTERED BY cannot combine with PARTITIONED BY")
    // The recorded schema normalizes partition columns to the END (the
    // relation's user-facing order is dataSchema ++ partitionSchema, and
    // every read path depends on that invariant). A CREATE TABLE declaring
    // a partition column mid-schema would therefore expose a column order
    // DIFFERENT from the declared DDL — positional INSERT INTO would
    // silently swap values between type-compatible columns. Refuse loudly
    // instead of silently reordering (Delta preserves declared order; we
    // document the trailing-columns contract).
    if (partitionCols.nonEmpty) {
      val declared = schema.fieldNames.toSeq
      val trailing = declared.takeRight(partitionCols.size)
      require(trailing == partitionCols,
        s"$path: partition column(s) (${partitionCols.mkString(", ")}) must be " +
          s"declared LAST in the schema and in PARTITIONED BY order (got " +
          s"schema ...${trailing.mkString(", ")}). graft stores partition " +
          "columns after data columns; declaring them elsewhere would make " +
          "SELECT * / positional INSERT INTO order diverge from the DDL.")
    }
    // GENERATED ALWAYS AS (expr) arrives as field metadata — lift each
    // expression into the commit-log property contract (validated against
    // the declared schema first) and strip the metadata, so the recorded
    // schema carries no engine-specific keys and every write verb — DF
    // API, SQL, streaming — enforces the generation uniformly
    import org.apache.spark.sql.catalyst.util.GeneratedColumn
    // generation/identity declarations may ONLY arrive through their DDL
    // channels (field metadata, validated below) — a raw TBLPROPERTIES key
    // would install an unvalidated expression or allocation state, exactly
    // what the setProperties smuggle guard closes post-create
    val guarded = Seq("graft.generated.", "graft.generatedZone.",
      "graft.identity.", "graft.identityHwm.")
    val smuggled = props.keys.filter(k => guarded.exists(k.startsWith))
    require(smuggled.isEmpty,
      s"$path: cannot set ${smuggled.mkString(", ")} via TBLPROPERTIES — " +
        "declare GENERATED/IDENTITY columns in the column list")
    val genCols: Map[String, String] = schema.fields.collect {
      case fl if GeneratedColumn.isGeneratedColumn(fl) =>
        fl.name -> GeneratedColumn.getGenerationExpression(fl).get
    }.toMap
    val genZones: Map[String, String] = genCols.flatMap { case (n, sql) =>
      val zoneDep = VersionedTable.validateGenerationExpr(spark, schema, n, sql,
        genCols.keySet - n)
      if (zoneDep) Some(VersionedTable.GeneratedZonePrefix + n ->
        spark.sessionState.conf.sessionLocalTimeZone)
      else None
    }
    val idCols: Map[String, String] = schema.fields.collect {
      case fl if fl.metadata.contains(GraftCatalog.IdentitySpecMetadataKey) =>
        fl.name -> fl.metadata.getString(GraftCatalog.IdentitySpecMetadataKey)
    }.toMap
    val strippedKeys = Seq(GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY,
      GraftCatalog.IdentitySpecMetadataKey)
    val cleanSchema = StructType(schema.fields.map { fl =>
      if (!strippedKeys.exists(fl.metadata.contains)) fl
      else {
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(fl.metadata)
        strippedKeys.foreach(mb.remove)
        fl.copy(metadata = mb.build())
      }
    })
    val empty = spark.createDataFrame(
      new util.ArrayList[org.apache.spark.sql.Row](), cleanSchema)
    // persist the user's TBLPROPERTIES in the commit log (minus the
    // engine-internal keys Spark itself adds to every CREATE TABLE) so
    // every writer observes them — autoCompact/optimizeWrite/constraints
    // are table contracts, not session settings
    val internalKeys = Set("provider", "location", "owner",
      "external", "is_managed_location")
    val stored = props.toMap.filter { case (k, _) =>
      !internalKeys.contains(k.toLowerCase) && !k.startsWith("option.") } ++
      genCols.map { case (n, sql) => s"graft.generated.$n" -> sql } ++
      genZones ++
      idCols.flatMap { case (n, spec) =>
        val start = spec.split(";").collectFirst {
          case s if s.startsWith("start=") => s.stripPrefix("start=") }.get
        Seq(s"graft.identity.$n" -> spec, s"graft.identityHwm.$n" -> start)
      } ++ bucketProps
    try VersionedTable.createEmpty(empty, path, statsCols, partitionCols, stored)
    catch {
      case e: IllegalStateException if e.getMessage.contains("already exists") =>
        throw new TableAlreadyExistsException(ident)
    }
    new GraftTable(spark, path, asOf = None)
  }

  /** `ALTER TABLE ... ADD COLUMNS / DROP COLUMN / RENAME COLUMN` land as
    * metadata-only schema-evolution commits ([[VersionedTable.addColumns]]/
    * [[VersionedTable.dropColumns]]/[[VersionedTable.renameColumn]] —
    * column mapping keeps old files readable); `SET/UNSET TBLPROPERTIES`
    * as a properties commit ([[VersionedTable.setProperties]]). Other
    * changes are refused loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val sets = changes.collect { case s: TableChange.SetProperty => s }
    val unsets = changes.collect { case u: TableChange.RemoveProperty => u }
    val addCons = changes.collect { case a: TableChange.AddConstraint => a }
    val dropCons = changes.collect { case d: TableChange.DropConstraint => d }
    val widens = changes.collect { case w: TableChange.UpdateColumnType => w }
    require(adds.size + drops.size + renames.size + sets.size + unsets.size +
        addCons.size + dropCons.size + widens.size == changes.size,
      s"$path: graft supports ALTER TABLE ADD COLUMNS / DROP COLUMN / " +
        "RENAME COLUMN / ALTER COLUMN ... TYPE (widening) / " +
        "SET TBLPROPERTIES / UNSET TBLPROPERTIES / " +
        s"ADD CONSTRAINT ... CHECK / DROP CONSTRAINT (got ${changes.mkString(", ")})")
    if (sets.nonEmpty || unsets.nonEmpty)
      VersionedTable.setProperties(spark, path,
        sets.map(s => s.property -> s.value).toMap, unsets.map(_.property))
    addCons.foreach { a =>
      a.constraint match {
        case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
          // validates existing rows, then commits the predicate into
          // table properties — every write verb enforces it from then on
          VersionedTable.addCheckConstraint(spark, path, chk.name,
            chk.predicateSql)
        case other => throw new UnsupportedOperationException(
          s"$path: only CHECK constraints are supported (got $other) — " +
            "uniqueness belongs to MERGE keys (upsert), not a stored flag")
      }
    }
    dropCons.foreach(d => VersionedTable.dropCheckConstraint(spark, path, d.name))
    if (adds.nonEmpty) {
      adds.foreach(a => require(a.fieldNames.length == 1,
        s"$path: nested ADD COLUMN not supported (${a.fieldNames.mkString(".")})"))
      VersionedTable.addColumns(spark, path,
        adds.map(a => org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType, a.isNullable)))
    }
    if (drops.nonEmpty) {
      drops.foreach(d => require(d.fieldNames.length == 1,
        s"$path: nested DROP COLUMN not supported (${d.fieldNames.mkString(".")})"))
      VersionedTable.dropColumns(spark, path, drops.map(_.fieldNames()(0)))
    }
    renames.foreach { r =>
      require(r.fieldNames.length == 1,
        s"$path: nested RENAME COLUMN not supported (${r.fieldNames.mkString(".")})")
      VersionedTable.renameColumn(spark, path, r.fieldNames()(0), r.newName)
    }
    widens.foreach { w =>
      require(w.fieldNames.length == 1,
        s"$path: nested ALTER COLUMN not supported (${w.fieldNames.mkString(".")})")
      // metadata-only TYPE WIDENING; non-widening changes refuse inside
      VersionedTable.widenColumn(spark, path, w.fieldNames()(0), w.newDataType)
    }
    loadTable(ident)
  }

  /** `DROP TABLE graft.`/path``: removes the table — commit log AND data
    * files — irreversibly. This is the managed-table contract; time travel
    * cannot survive it. */
  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    if (VersionedTable.latestVersion(spark, path).isEmpty) false
    else {
      // dropping a MATERIALIZED VIEW unregisters it from its source, so
      // the rewrite rule stops probing a path that no longer exists (a
      // dangling candidate is harmless — tryView declines on the missing
      // version — but costs every aggregate query a manifest miss)
      scala.util.Try {
        val props = VersionedTable.propertiesOf(spark, path)
        props.get(graft.sources.MaterializedView.SourceKey)
          .filter(_.nonEmpty).foreach { src =>
            val left = graft.sources.MaterializedView
              .viewsIn(VersionedTable.propertiesOf(spark, src))
              .filterNot(_ == path)
            VersionedTable.setProperties(spark, src,
              if (left.isEmpty) Map.empty
              else Map(graft.sources.MaterializedView.ViewsKey -> left.mkString(",")),
              unset = if (left.isEmpty)
                Seq(graft.sources.MaterializedView.ViewsKey) else Nil)
          }
      }
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      // a view with COUNT(DISTINCT) columns owns its helper tables — they
      // are derived content with no independent life
      scala.util.Try {
        val props = VersionedTable.propertiesOf(spark, path)
        graft.sources.MaterializedView.distinctsIn(props).foreach { t =>
          fs.delete(new Path(graft.sources.MaterializedView
            .distinctHelperPath(path, t)), true)
        }
      }
      fs.delete(root, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft tables are identified by path; move the directory instead")

  /** Path-based catalog: no enumerable namespace. */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def invalidateTable(ident: Identifier): Unit = ()
}

object GraftCatalog {
  /** Internal field-metadata channel the Column[]→StructType bridge uses to
    * hand a validated identity declaration to the schema-based createTable;
    * stripped before the schema is recorded. */
  private[sql] val IdentitySpecMetadataKey = "__graft_identity_spec"
}
