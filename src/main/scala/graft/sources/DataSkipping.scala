package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** File-level data skipping — per-file min/max column statistics recorded in
  * the commit manifest at write time, pruned against query predicates at
  * read time. This is the capability Delta pairs with `OPTIMIZE ... ZORDER
  * BY` (the reference's own scan-pruning guidance,
  * `sql/ddl/02_silver_events.sql:61`, `01_bronze.sql:24-26`): z-ordering
  * clusters the data so each file covers a narrow range of EVERY clustering
  * dimension, and manifest-level stats then let a selective reader skip
  * whole files WITHOUT opening their footers. At 100 TB that is the
  * difference between planning against 100 files and 100 000 — parquet
  * row-group stats only help after every footer has already been fetched.
  *
  * Stats COLLECTION reads only parquet footers (pure metadata, never data
  * pages), distributed over the executors so a million-file commit doesn't
  * serialize on the driver.
  *
  * Pruning is CONSERVATIVE by construction: a file is skipped only when the
  * recorded [min, max] (or all-null marker) PROVES no row can satisfy the
  * predicate; any unsupported predicate shape, missing stat, or unsupported
  * type keeps the file. Correctness never depends on pruning — readers
  * re-apply the full predicate to the rows of every file they do open.
  */
object DataSkipping {

  /** Min/max/null summary of one column within one file. `min`/`max` are
    * None when the writer recorded no usable bound (e.g. parquet omitted
    * oversized binary stats) — such a column never prunes the file.
    * `inexact` marks TRUNCATED string bounds (see [[StatStringMaxLen]]):
    * still sound for pruning (outer bounds), but metadata-only MIN/MAX
    * must refuse them — the true extremum may lie strictly inside. */
  final case class ColStat(
      min: Option[Any], max: Option[Any], numNulls: Long, allNulls: Boolean,
      inexact: Boolean = false,
      /** KMV NDV sketch: the k smallest md5 hex hashes of the column's
        * values in THIS file, sorted ascending — mergeable across files
        * (union keeping k smallest), so table-level or pruned-subset NDV
        * answers at plan time from the manifest alone. Written by
        * ANALYZE ... COMPUTE NDV, absent otherwise. */
      ndv: Option[Seq[String]] = None,
      /** Hash-recipe version the sketch was written under. Recipe 1
        * (legacy, the parse-time default) stringified binary values by
        * JVM identity, so its hashes are NOT reproducible at plan time;
        * recipe 2 canonicalizes binary as Base64 (content-based).
        * Dictionary probes on BinaryType require >= 2 — probing an old
        * sketch with the new recipe would wrongly report a present value
        * absent and skip a file that contains it. NDV *counting* is
        * recipe-agnostic (it only sizes the hash set). */
      ndvRecipe: Int = 1,
      /** EXACT sum of the column's live non-null values in this file
        * (integral/decimal columns only — floating sums are not
        * order-exact), written by ANALYZE alongside the NDV sketch; 0 for
        * an all-null file (SQL SUM's per-file contribution), absent when
        * never analyzed or when the per-file fold overflowed 38 digits.
        * Files are immutable, so a recorded sum stays exact until DV
        * marks appear — what turns a global `SUM(col)` into a manifest
        * answer. */
      sum: Option[BigDecimal] = None,
      /** JOINT null counts: rows where THIS column AND the named other
        * column are BOTH null, recorded by ANALYZE for every pair of
        * requested columns (keyed on the lexicographically-FIRST column,
        * entries name the second). With per-column null counts this
        * composes the exact matching-row count of a TWO-nullable-column
        * range filter by inclusion-exclusion — what lifts the boundary
        * rewrite's two-nullable decline. Absent ⇒ unknown (decline). */
      jointNulls: Map[String, Long] = Map.empty,
      /** Per-SET "rows null in >= 1 of these columns" counts, recorded by
        * ANALYZE when THREE or more columns are requested together (keyed
        * on the set's lexicographically-FIRST column; the map key names
        * the REMAINING columns, sorted and comma-joined — parquet forbids
        * commas in column names). `rows − nullAny` is then the exact
        * count of rows non-null in EVERY set column, which composes the
        * boundary rewrite's matching count past the two-nullable
        * inclusion-exclusion. Absent ⇒ unknown (decline). */
      nullAny: Map[String, Long] = Map.empty)

  /** Stored string bounds are capped at this many chars (Delta's 32-char
    * stats truncation): on an LLM corpus with stats collected on a text
    * column, verbatim bounds would put two full documents PER FILE into the
    * manifest/checkpoint — metadata that can blow up. Truncation keeps the
    * bounds OUTER (min → prefix, which UTF-8-orders <= the original; max →
    * prefix with its last incrementable char bumped, which orders > it), so
    * pruning stays conservative and can never produce a false skip. */
  val StatStringMaxLen = 32

  /** Outer upper bound for an over-long string: 32-char prefix with the
    * last char below the surrogate range incremented, everything after
    * dropped — strictly greater than the original in UTF-8 order. None for
    * the pathological all-unincrementable prefix (no bound recorded; the
    * column then never prunes that file, never lies). */
  private def truncMax(s: String): Option[String] = {
    val p = s.substring(0, StatStringMaxLen)
    val i = p.lastIndexWhere(c => c < 0xD7FF.toChar)
    if (i < 0) None else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  /** Apply string truncation to a merged (min, max) pair; the third element
    * reports whether any bound is now inexact. A truncated MIN is just the
    * prefix — taking fewer chars can only order <= the original, even when
    * the cut splits a surrogate pair. */
  private def truncateBounds(mn: Option[Any], mx: Option[Any])
      : (Option[Any], Option[Any], Boolean) = {
    val longMin = mn.exists { case s: String => s.length > StatStringMaxLen; case _ => false }
    val longMax = mx.exists { case s: String => s.length > StatStringMaxLen; case _ => false }
    if (!longMin && !longMax) (mn, mx, false)
    else (
      if (longMin) mn.map { case s: String => s.substring(0, StatStringMaxLen) } else mn,
      if (longMax) mx.flatMap { case s: String => truncMax(s) } else mx,
      true)
  }

  /** file name (relative to the data dir) -> column -> stat */
  type FileStats = Map[String, Map[String, ColStat]]

  // ------------------------------------------------------------------
  // Collection (write path)
  // ------------------------------------------------------------------

  /** One file's manifest-bound metadata: per-column min/max stats plus the
    * file's total row count (the latter powers metadata-only `count(*)`)
    * and the footer's top-level field names (CONVERT uses these to refuse
    * adopting a directory whose files disagree on schema — the same footer
    * pass, no extra I/O). */
  final case class FileMeta(stats: Map[String, ColStat], rows: Long,
      fields: Seq[String] = Nil)

  /** Read per-file min/max for `cols` AND per-file row counts from the
    * parquet FOOTERS of `files` (pairs of manifest key → absolute path),
    * merging row-group stats per file. Footer reads are fanned out over the
    * cluster (one task per slice of the file list); only the keys and the
    * tiny per-column summaries travel back to the driver. Row counts are
    * read even when `cols` is empty — they come from the same footer. */
  /** Decode a raw (already hive-unescaped) partition DIRECTORY value to
    * the column's internal Catalyst value — the ONE decode behind the
    * scan's partition rows, the stats-domain partition pruning, and the
    * maintenance verbs' partition scoping (three call sites that must
    * never diverge on the same dir string). TRY mode: under the session
    * default (ANSI on Spark 4) an uncastable value would THROW at plan
    * time; TRY degrades it to null — no stat, never prunes, never lies. */
  def castPartValue(raw: String,
      dt: org.apache.spark.sql.types.DataType, zone: Option[String]): Any =
    org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(raw),
        org.apache.spark.sql.types.StringType),
      dt, zone,
      org.apache.spark.sql.catalyst.expressions.EvalMode.TRY).eval(null)

  def collectMeta(spark: SparkSession, files: Seq[(String, String)],
      cols: Seq[String]): Map[String, FileMeta] = {
    if (files.isEmpty) return Map.empty
    val conf = spark.sessionState.newHadoopConf()
    // Hadoop Configuration is not Serializable — ship it as its entry map
    // (public API only) and rebuild on the executor, so cluster-specific
    // settings (object-store credentials etc.) reach the footer reader.
    val confMap: Map[String, String] = {
      val it = conf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    val colSet = cols.toSet
    val n = math.min(files.size, spark.sparkContext.defaultParallelism)
    spark.sparkContext.parallelize(files, n).mapPartitions { pairs =>
      val c = new Configuration(false)
      confMap.foreach { case (k, v) => c.set(k, v) }
      pairs.map { case (key, p) => key -> footerMeta(new Path(p), c, colSet) }
    }.collect().toMap
  }

  /** Merge one file's row-group stats per requested column + its row count. */
  private def footerMeta(
      file: Path, conf: Configuration, cols: Set[String]): FileMeta = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val rowCount = blocks.map(_.getRowCount).sum
      val perCol = blocks.flatMap(_.getColumns.asScala)
        .filter(c => c.getPath.size() == 1 && cols.contains(c.getPath.toDotString))
        .groupBy(_.getPath.toDotString)
      val colStats = perCol.flatMap { case (name, chunks) =>
        var mn: Option[Any] = None
        var mx: Option[Any] = None
        var nulls = 0L
        var values = 0L
        var usable = true
        chunks.foreach { ch =>
          val st = ch.getStatistics
          val rows = ch.getValueCount
          if (st == null || !st.isNumNullsSet) { usable = false }
          else {
            nulls += st.getNumNulls
            values += rows - st.getNumNulls
            if (rows - st.getNumNulls > 0) {
              if (!st.hasNonNullValue) usable = false // stats omitted (e.g. huge binary)
              else {
                val ann = ch.getPrimitiveType.getLogicalTypeAnnotation
                (chunkStat(st.genericGetMin.asInstanceOf[AnyRef], ann),
                  chunkStat(st.genericGetMax.asInstanceOf[AnyRef], ann)) match {
                  case (Some(lo), Some(hi)) =>
                    mn = Some(mn.fold(lo)(m => if (ordLt(lo, m)) lo else m))
                    mx = Some(mx.fold(hi)(m => if (ordLt(m, hi)) hi else m))
                  case _ => usable = false
                }
              }
            }
          }
        }
        if (!usable) Some(name -> ColStat(None, None, nulls, allNulls = false))
        else {
          val (tmn, tmx, inexact) = truncateBounds(mn, mx)
          Some(name -> ColStat(tmn, tmx, nulls, allNulls = values == 0L, inexact))
        }
      }.toMap
      val fieldNames =
        reader.getFooter.getFileMetaData.getSchema.getFields.asScala
          .map(_.getName).toSeq
      FileMeta(colStats, rowCount, fieldNames)
    } finally reader.close()
  }

  /** Stat value dispatch on the column's LOGICAL type: decimal columns store
    * the UNSCALED integer in their physical INT32/INT64/BINARY stats (12.34
    * arrives as 1234), so they must be rescaled into the same BigDecimal
    * domain the literal side uses — comparing scaled vs unscaled silently
    * skipped files containing matching rows. */
  private def chunkStat(
      v: AnyRef, ann: org.apache.parquet.schema.LogicalTypeAnnotation): Option[Any] =
    ann match {
      case d: org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
        decimalStat(v, d.getScale)
      case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        timestampStat(v, t.getUnit)
      case _ => statValue(v)
    }

  /** INT64 timestamp stats carry whatever unit the WRITER chose
    * (`spark.sql.parquet.outputTimestampType`), but the literal domain
    * ([[litValue]]) is always Spark's internal MICROS — so MILLIS stats must
    * be rescaled ×1000 into the same domain (comparing millis bounds against
    * a micros literal made `ts >= X` prune every file: max-in-millis ≪
    * literal-in-micros). NANOS would need direction-aware rounding this
    * value-level hook cannot do (truncating a max down could wrongly prune),
    * so NANOS stats answer None — the column never prunes, never lies. */
  private def timestampStat(v: AnyRef,
      unit: org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit): Option[Any] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    v match {
      case l: java.lang.Long => unit match {
        case TimeUnit.MICROS => Some(BigDecimal(l.longValue()))
        case TimeUnit.MILLIS => Some(BigDecimal(l.longValue()) * 1000)
        case _ => None
      }
      case _ => None
    }
  }

  /** Unscaled physical decimal stat → scaled BigDecimal. Covers all three
    * parquet physical encodings Spark writes: INT32 (precision<=9), INT64
    * (<=18), and big-endian two's-complement BINARY/FIXED_LEN_BYTE_ARRAY. */
  private def decimalStat(v: AnyRef, scale: Int): Option[Any] = v match {
    case i: java.lang.Integer => Some(BigDecimal(BigInt(i.longValue()), scale))
    case l: java.lang.Long => Some(BigDecimal(BigInt(l.longValue()), scale))
    case b: org.apache.parquet.io.api.Binary =>
      scala.util.Try(BigDecimal(BigInt(new java.math.BigInteger(b.getBytes)), scale)).toOption
    case _ => None
  }

  /** Normalize a parquet stat value to the comparison domain: BigDecimal for
    * every numeric physical type, String for UTF-8 binary. Unsupported
    * physical types return None (column never prunes). Non-finite
    * float/double stats (NaN/±Inf — legal parquet data, and BigDecimal
    * construction throws on them) also return None: the contract is that an
    * unsupported value disables pruning, never fails the commit. */
  private def statValue(v: AnyRef): Option[Any] = v match {
    case i: java.lang.Integer => Some(BigDecimal(i.intValue()))
    case l: java.lang.Long => Some(BigDecimal(l.longValue()))
    // float widens to double EXACTLY first: both stat and literal domains
    // then use the same double→decimal mapping (shortest representation),
    // which is injective and order-preserving on doubles — mixing a float
    // shortest-repr ("7.1") with its exact double ("7.09999990463...")
    // would mis-prune at ulp scale
    case f: java.lang.Float if java.lang.Float.isFinite(f.floatValue()) =>
      Some(BigDecimal(f.floatValue().toDouble))
    case d: java.lang.Double if java.lang.Double.isFinite(d.doubleValue()) =>
      Some(BigDecimal(d.doubleValue()))
    case b: org.apache.parquet.io.api.Binary =>
      scala.util.Try(b.toStringUsingUTF8).toOption
    case _ => None
  }

  /** [[ordLt]] as an Ordering, for consumers aggregating bounds across
    * files (e.g. manifest-level MIN/MAX). */
  val statOrdering: Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int =
      if (ordLt(a, b)) -1 else if (ordLt(b, a)) 1 else 0
  }

  /** Total order used for stat merging: numeric (BigDecimal) or UTF-8 byte
    * order for strings (parquet's UNSIGNED binary comparator — Java String
    * compareTo would disagree on supplementary characters). */
  private def ordLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x < y
    case (x: String, y: String) => utf8Lt(x, y)
    case _ => false
  }

  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  // ------------------------------------------------------------------
  // Manifest (de)serialization
  // ------------------------------------------------------------------

  /** Shared, thread-safe after construction; a fresh ObjectMapper per
    * checkpoint ROW would make a million-file checkpoint driver-CPU-bound
    * on mapper construction alone. */
  private val sharedMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Fold one ANALYZE patch — `to_json(struct(ndv, sum, cnt))` computed
    * per (file, column) on the executors — into the column's prior stat:
    * the KMV sketch always lands (current recipe); the EXACT sum lands for
    * sum-eligible columns (0 for an all-null file — SQL SUM's per-file
    * contribution; an overflowed per-file fold arrives null with cnt > 0
    * and keeps the prior sum, which stays correct — files are immutable). */
  private[graft] def applyAnalyzePatch(prior: ColStat, patchJson: String,
      sumEligible: Boolean): ColStat = {
    val node = sharedMapper.readTree(patchJson)
    import scala.jdk.CollectionConverters._
    val h = Option(node.get("ndv"))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    val cnt = Option(node.get("cnt")).map(_.asLong()).getOrElse(0L)
    val sm =
      if (!sumEligible) None
      else if (cnt == 0L) Some(BigDecimal(0))
      else Option(node.get("sum")).map(s => BigDecimal(s.asText()))
    // joint-null counts merge additively over pairs: files are immutable,
    // so a re-analyzed pair re-records the identical value
    val jn = Option(node.get("jn")).map(j => j.properties().asScala.map(e =>
      e.getKey -> e.getValue.asLong()).toMap).getOrElse(Map.empty)
    // per-set null-any counts (3+ column ANALYZE) merge the same way
    val na = Option(node.get("na")).map(j => j.properties().asScala.map(e =>
      e.getKey -> e.getValue.asLong()).toMap).getOrElse(Map.empty)
    prior.copy(ndv = Some(h), ndvRecipe = NdvRecipeCurrent,
      sum = sm.orElse(prior.sum),
      jointNulls = prior.jointNulls ++ jn,
      nullAny = prior.nullAny ++ na)
  }

  /** One FILE's column-stat map as a JSON object string — the unit a
    * parquet checkpoint manifest stores per row (one row per file), so a
    * million-file checkpoint never serializes as one monolithic string. */
  def colsToJson(cols: Map[String, ColStat]): String = {
    def v(a: Any): String = a match {
      case d: BigDecimal => d.bigDecimal.toPlainString
      case s: String => sharedMapper.writeValueAsString(s)
      case other => other.toString
    }
    cols.toSeq.sortBy(_._1).map { case (c, st) =>
      val mn = st.min.map(x => s""""min":${v(x)},""").getOrElse("")
      val mx = st.max.map(x => s""""max":${v(x)},""").getOrElse("")
      val tr = if (st.inexact) s""""trunc":true,""" else ""
      val nd = st.ndv.map(h => s""""ndv":${h.map(x =>
        sharedMapper.writeValueAsString(x)).mkString("[", ",", "]")},""")
        .getOrElse("")
      // recipe marker rides only when a sketch does and only past legacy —
      // absent ⇒ parse-time default 1 keeps old manifests byte-compatible
      val ndV = if (st.ndv.isDefined && st.ndvRecipe > 1)
        s""""ndv_v":${st.ndvRecipe},""" else ""
      // exact sums as plain strings: BigDecimal round-trips losslessly
      val sm = st.sum.map(x =>
        s""""sum":"${x.bigDecimal.toPlainString}",""").getOrElse("")
      val jn = if (st.jointNulls.isEmpty) ""
        else st.jointNulls.toSeq.sortBy(_._1).map { case (k, v) =>
          s"${sharedMapper.writeValueAsString(k)}:$v"
        }.mkString(""""jn":{""", ",", "},")
      val na = if (st.nullAny.isEmpty) ""
        else st.nullAny.toSeq.sortBy(_._1).map { case (k, v) =>
          s"${sharedMapper.writeValueAsString(k)}:$v"
        }.mkString(""""na":{""", ",", "},")
      s""""$c":{$mn$mx$tr$nd$ndV$sm$jn$na"nulls":${st.numNulls},"all_nulls":${st.allNulls}}"""
    }.mkString("{", ",", "}")
  }

  def colsFromJson(node: com.fasterxml.jackson.databind.JsonNode): Map[String, ColStat] = {
    import scala.jdk.CollectionConverters._
    node.properties().asScala.map { ce =>
      val o = ce.getValue
      def bound(k: String): Option[Any] = Option(o.get(k)).map { b =>
        if (b.isNumber) BigDecimal(b.decimalValue()) else b.asText()
      }
      ce.getKey -> ColStat(bound("min"), bound("max"),
        Option(o.get("nulls")).map(_.asLong()).getOrElse(0L),
        Option(o.get("all_nulls")).exists(_.asBoolean()),
        Option(o.get("trunc")).exists(_.asBoolean()),
        Option(o.get("ndv")).map(a => a.elements().asScala
          .map(_.asText()).toSeq),
        Option(o.get("ndv_v")).map(_.asInt()).getOrElse(1),
        Option(o.get("sum")).map(s => BigDecimal(s.asText())),
        Option(o.get("jn")).map(j => j.properties().asScala.map(e =>
          e.getKey -> e.getValue.asLong()).toMap).getOrElse(Map.empty),
        Option(o.get("na")).map(j => j.properties().asScala.map(e =>
          e.getKey -> e.getValue.asLong()).toMap).getOrElse(Map.empty))
    }.toMap
  }

  def colsFromJson(s: String): Map[String, ColStat] =
    colsFromJson(sharedMapper.readTree(s))

  def toJson(stats: FileStats): String =
    stats.toSeq.sortBy(_._1).map { case (file, cols) =>
      s""""$file":${colsToJson(cols)}"""
    }.mkString("{", ",", "}")

  def fromJson(node: com.fasterxml.jackson.databind.JsonNode): FileStats = {
    import scala.jdk.CollectionConverters._
    node.properties().asScala.map { e =>
      e.getKey -> colsFromJson(e.getValue)
    }.toMap
  }

  // ------------------------------------------------------------------
  // Pruning (read path)
  // ------------------------------------------------------------------

  /** The literal side of a comparison, folded: a bare Literal, or any
    * foldable expression (the analyzer wraps literals in Casts for type
    * coercion — e.g. a decimal(4,2) literal cast to the column's
    * decimal(18,2) — which never constant-fold in the ANALYZED plan
    * `resolve` produces). Evaluation failures (ANSI overflow) answer None:
    * the file is kept. */
  private def asLiteral(e: Expression): Option[Literal] = e match {
    case l: Literal => Some(l)
    case _ if e.foldable =>
      scala.util.Try(Literal.create(e.eval(EmptyRow), e.dataType)).toOption
    case _ => None
  }

  private def isLit(e: Expression): Boolean = asLiteral(e).isDefined

  /** True iff the stats PROVE no row of the file can satisfy `predicate`
    * (i.e. the file is skippable). Unknown shapes answer false. Reversed
    * comparisons (literal on the left) are flipped first so both spellings
    * prune. */
  def canSkip(predicate: Expression, stats: Map[String, ColStat]): Boolean =
    predicate match {
      case And(l, r) => canSkip(l, stats) || canSkip(r, stats)
      case Or(l, r) => canSkip(l, stats) && canSkip(r, stats)
      case EqualTo(l, a) if isLit(l) && !isLit(a) => canSkip(EqualTo(a, l), stats)
      case GreaterThan(l, a) if isLit(l) && !isLit(a) => canSkip(LessThan(a, l), stats)
      case GreaterThanOrEqual(l, a) if isLit(l) && !isLit(a) =>
        canSkip(LessThanOrEqual(a, l), stats)
      case LessThan(l, a) if isLit(l) && !isLit(a) => canSkip(GreaterThan(a, l), stats)
      case LessThanOrEqual(l, a) if isLit(l) && !isLit(a) =>
        canSkip(GreaterThanOrEqual(a, l), stats)
      case EqualTo(a, l) => cmpSkip(a, l, stats)(
        (mn, mx, v) => ordLt(v, mn) || ordLt(mx, v)) || dictSkip(a, l, stats)
      // null-safe equality (the grouped rewrites inject it for NULL-able
      // group keys): a NULL literal matches only null rows — skippable
      // when the file provably has none; a non-null literal prunes
      // exactly like EqualTo (null rows never <=>-match it)
      case EqualNullSafe(l, a) if isLit(l) && !isLit(a) =>
        canSkip(EqualNullSafe(a, l), stats)
      case EqualNullSafe(a, l) if isLit(l) =>
        asLiteral(l) match {
          case Some(lit) if lit.value == null =>
            attrName(a).flatMap(stats.get).exists(st =>
              st.numNulls == 0L && !st.allNulls && st.min.isDefined)
          case _ => canSkip(EqualTo(a, l), stats)
        }
      case GreaterThan(a, l) => cmpSkip(a, l, stats)(
        (_, mx, v) => !ordLt(v, mx)) // max <= v
      case GreaterThanOrEqual(a, l) => cmpSkip(a, l, stats)(
        (_, mx, v) => ordLt(mx, v)) // max < v
      case LessThan(a, l) => cmpSkip(a, l, stats)(
        (mn, _, v) => !ordLt(mn, v)) // min >= v
      case LessThanOrEqual(a, l) => cmpSkip(a, l, stats)(
        (mn, _, v) => ordLt(v, mn)) // min > v
      case In(a, vs) if vs.forall(isLit) =>
        vs.forall(v => canSkip(EqualTo(a, v), stats))
      case IsNull(a) =>
        attrName(a).flatMap(stats.get)
          .exists(st => st.numNulls == 0L && !st.allNulls && st.min.isDefined)
      case IsNotNull(a) => attrName(a).flatMap(stats.get).exists(_.allNulls)
      case _ => false
    }

  /** DICTIONARY-COMPLETE equality pruning from the NDV sketches: a
    * per-file KMV sketch with FEWER than k hashes contains the md5 of
    * EVERY distinct value in the file (the k-minimum cut never dropped
    * one), so for a categorical column — the case where overlapping
    * min/max ranges never prune — `c = v` provably misses any file whose
    * complete hash set lacks md5(v). This is the 100 TB categorical
    * lookup: `status = 'failed'` over shuffled files skips every file that
    * never saw the value, straight from the manifest, no footer opened.
    *
    * Soundness: an md5 collision can only ADD a hash (keeps the file —
    * conservative); a file whose sketch is saturated (size == k) may have
    * dropped hashes and never prunes; later DV deletes only shrink the
    * live set, so the analyzed set stays a superset. The literal must be
    * the column's EXACT type with no cast in between — the hash is of the
    * internal value's canonical string, and a widening cast can change it
    * (0.1f vs 0.1f.toDouble stringify differently). NULL literals never
    * match rows anyway (equality is not null-safe here). */
  private def dictSkip(attr: Expression, lit: Expression,
      stats: Map[String, ColStat]): Boolean = (attr, asLiteral(lit)) match {
    case (a: AttributeReference, Some(l))
        if l.value != null && l.dataType == a.dataType &&
          // value-stable canonical strings only: array/struct internal
          // values have no content-based toString, so their hashes never
          // probe soundly
          dictProbeType(a.dataType) =>
      stats.get(a.name).exists(st => st.ndv.exists(h =>
        h.size < VersionedTable.NdvSketchK &&
          // binary sketches written before the Base64 canonical recipe
          // hashed Array[Byte].toString (JVM identity) — probing them
          // with the content recipe would false-skip; require the
          // recipe marker for BinaryType probes
          (a.dataType != BinaryType || st.ndvRecipe >= NdvRecipeCurrent) &&
          !h.contains(graft.functions.MinHashSketchAgg.md5Hex(
            graft.functions.MinHashSketchAgg.canonical(l.value)))))
    case _ => false
  }

  /** Current sketch hash-recipe version, stamped on every new ANALYZE
    * sketch (see [[ColStat.ndvRecipe]]). Bump whenever the canonical
    * string of ANY probe-able type changes. */
  val NdvRecipeCurrent = 2

  /** Types whose INTERNAL values stringify by content — the producer's
    * hash recipe and the plan-time probe then agree byte-for-byte. */
  private def dictProbeType(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
        LongType | FloatType | DoubleType | DateType | TimestampType |
        TimestampNTZType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Shared shape for `attr <op> literal`: resolve the column's stat and the
    * literal into the comparison domain; `skip(min, max, lit)` decides.
    * Comparison predicates never match NULL rows, so an all-null column
    * skips them outright. */
  private def cmpSkip(attr: Expression, lit: Expression,
      stats: Map[String, ColStat])(skip: (Any, Any, Any) => Boolean): Boolean =
    (attrName(attr), asLiteral(lit)) match {
      case (Some(name), Some(l)) =>
        stats.get(name).exists { st =>
          st.allNulls || (litValue(l) match {
            case Some(v) => (st.min, st.max) match {
              case (Some(mn), Some(mx)) if comparable(mn, v) => skip(mn, mx, v)
              case _ => false
            }
            case None => false
          })
        }
      case _ => false
    }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute if a.nameParts.size == 1 => Some(a.nameParts.head)
    case a: AttributeReference => Some(a.name)
    // the analyzer wraps attributes in implicit casts for type coercion
    // (e.g. intCol === 3L becomes Cast(intCol, bigint) = 3L); an
    // order-preserving numeric widening is transparent to min/max pruning
    // because the BigDecimal comparison domain already unifies widths
    case Cast(child, to, _, _) if orderPreserving(child.dataType, to) => attrName(child)
    case _ => None
  }

  /** Casts that are EXACT on every input value, so comparing the literal
    * against the raw (uncast) file min/max in the BigDecimal domain is
    * sound: integral → wider integral, float → double, and integral →
    * sufficiently wide decimal. NOT long → double (values above 2^53 round,
    * so a literal can sit within 1 ulp outside the raw bounds), not any
    * narrowing (overflow wraps), not string/date/timestamp casts. */
  private def orderPreserving(from: DataType, to: DataType): Boolean = {
    def intRank(t: DataType): Int = t match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 3
      case LongType => 4
      case _ => 0
    }
    val fi = intRank(from)
    val ti = intRank(to)
    (fi > 0 && ti >= fi) ||
      (from == FloatType && to == DoubleType) ||
      ((from, to) match {
        case (f, d: DecimalType) if intRank(f) > 0 =>
          // a decimal wide enough to hold every value of the integral type
          d.precision - d.scale >= (intRank(f) match {
            case 1 => 3; case 2 => 5; case 3 => 10; case _ => 19
          })
        // decimal → wider decimal is exact when neither the integer digits
        // nor the fraction digits shrink (no rounding, no overflow)
        case (f: DecimalType, t: DecimalType) =>
          t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
        case _ => false
      })
  }

  /** Literal → comparison domain. Dates/timestamps ride as their internal
    * numeric encodings (days / micros), matching what parquet footers store
    * for those physical types. */
  private def litValue(l: Literal): Option[Any] = (l.value, l.dataType) match {
    case (null, _) => None
    case (v: Int, DateType) => Some(BigDecimal(v))
    case (v: Long, TimestampType) => Some(BigDecimal(v))
    case (v: Long, TimestampNTZType) => Some(BigDecimal(v))
    case (v: Byte, _) => Some(BigDecimal(v.toInt))
    case (v: Short, _) => Some(BigDecimal(v.toInt))
    case (v: Int, _) => Some(BigDecimal(v))
    case (v: Long, _) => Some(BigDecimal(v))
    case (v: Float, _) if java.lang.Float.isFinite(v) =>
      Some(BigDecimal(v.toDouble)) // see statValue: same domain
    case (v: Double, _) if java.lang.Double.isFinite(v) => Some(BigDecimal(v))
    case (v: Decimal, _) => Some(v.toBigDecimal)
    case (v: org.apache.spark.unsafe.types.UTF8String, _) => Some(v.toString)
    case _ => None
  }

  private def comparable(stat: Any, lit: Any): Boolean = (stat, lit) match {
    case (_: BigDecimal, _: BigDecimal) => true
    case (_: String, _: String) => true
    case _ => false
  }

  /** Resolve a user predicate `Column` against the table schema into the
    * analyzed catalyst condition. Spark 4 Columns carry a lazy ColumnNode
    * tree (UnresolvedFunction et al.), not catalyst nodes — running the
    * ACTUAL analyzer over an empty relation of the manifest schema yields
    * the same resolved tree (typed literals, implicit casts, case-resolved
    * attributes) the scan itself would filter with. */
  def resolve(spark: SparkSession, schema: StructType, predicate: Column): Expression = {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    empty.filter(predicate).queryExecution.analyzed.collectFirst {
      case f: Filter => f.condition
    }.getOrElse(Literal.TrueLiteral)
  }

  /** Partition a manifest's file KEYS into (kept, skipped) under the
    * RESOLVED `predicate` given the manifest's stats (keyed identically).
    * Files absent from the stats map are always kept. */
  def prune(files: Seq[String], stats: FileStats,
      predicate: Expression): (Seq[String], Seq[String]) =
    files.partition { f =>
      stats.get(f) match {
        case Some(colStats) => !canSkip(predicate, colStats)
        case None => true
      }
    }

  /** Exact per-FILE ColStats for the partition columns, synthesized from
    * the file's path segments (min = max = the dir value; the hive null
    * sentinel is an all-null column) — what lets the per-file pruning
    * pass disprove the PARTITION half of a mixed disjunct like the
    * grouped top-k's `(day <=> d AND ts >= tau_d) OR …`, where
    * fragment-level pruning cannot drop a dir (its own disjunct is
    * alive) but each file still skips when every OTHER day's disjunct
    * fails on `day` and its own fails on `ts`. Serializable (used by the
    * distributed prune); a value that fails to cast or has no stats
    * domain contributes no stat — never prunes, never lies.
    *
    * @param partFields (logical name, physical dir name, type) of every
    *                   partition column
    */
  def pathPartStats(path: String,
      partFields: Seq[(String, String, org.apache.spark.sql.types.DataType)],
      zone: Option[String]): Map[String, ColStat] = {
    if (partFields.isEmpty) return Map.empty
    val kv: Map[String, String] = path.split('/').dropRight(1)
      .flatMap { seg =>
        val i = seg.indexOf('=')
        if (i > 0) Some(seg.substring(0, i) -> seg.substring(i + 1)) else None
      }.toMap
    partFields.flatMap { case (n, phys, dt) =>
      kv.get(phys) match {
        case None => None // token layout / absent dir: no stat
        case Some("__HIVE_DEFAULT_PARTITION__") =>
          Some(n -> ColStat(None, None, numNulls = 1L, allNulls = true))
        case Some(raw) =>
          Option(castPartValue(
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(raw), dt, zone))
            .flatMap(graft.sql.BoundaryWalk.statDomainOf)
            .map(v => n -> ColStat(Some(v), Some(v), 0L, allNulls = false))
      }
    }.toMap
  }
}
