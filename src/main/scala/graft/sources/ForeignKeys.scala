package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Validated, PIN-ANCHORED foreign keys — the warehouse `FOREIGN KEY ...
  * RELY` constraint, made exact the same way the materialized-view
  * rewrite is: a declaration is an O(table) VALIDATION (dim key unique;
  * every fact key non-null and matched) whose result is recorded with the
  * exact (fact version, dim version) it was proven at, and the optimizer
  * ([[graft.sql.GraftJoinElimination]]) trusts it ONLY while both tables
  * still sit at those versions. Any commit on either side silently
  * disarms the pin — never approximates — and re-declaring re-validates
  * and re-pins (idempotent; the daily-load pattern is load → re-declare).
  *
  * What the pin buys at 100 TB: a BI query that joins the star but reads
  * only fact columns drops the dim scan AND the join (shuffle or
  * broadcast) from the plan entirely — the classic RELY join-elimination,
  * with the integrity claim actually checked rather than taken on faith
  * (Snowflake/Oracle RELY trusts the user; a wrong claim silently changes
  * results — here a wrong claim cannot be declared).
  *
  * Validation semantics (proven at declaration, exactly what elimination
  * needs):
  *  - the dim key tuple is UNIQUE → each fact row matches at most once;
  *  - every fact key tuple is NON-NULL and PRESENT in the dim → the inner
  *    join keeps every fact row exactly once.
  * Together: `fact ⋈ dim` restricted to fact columns IS the fact. */
object ForeignKeys {

  /** One property per declared key set, on the FACT table:
    * `graft.fk.<fkCols ~-joined>` →
    * `fkCols<US>dimPath<US>pkCols<US>factPin<US>dimPin`. */
  val Prefix = "graft.fk."
  /** One property per declared UNIQUE key set, on the table itself:
    * `graft.unique.<cols ~-joined>` -> `cols<US>pin`. A unique pin alone
    * licenses LEFT-join elimination (each left row matches at most once,
    * and unmatched rows survive the left join anyway - no referential
    * check needed). */
  val UniquePrefix = "graft.unique."
  private val Us = '\u001F'

  case class Decl(fkCols: Seq[String], dimPath: String, pkCols: Seq[String],
      factPin: Long, dimPin: Long)

  def keyFor(fkCols: Seq[String]): String = Prefix + fkCols.mkString("~")

  private[graft] def serialize(d: Decl): String =
    Seq(d.fkCols.mkString(","), d.dimPath, d.pkCols.mkString(","),
      d.factPin.toString, d.dimPin.toString).mkString(Us.toString)

  private[graft] def parse(v: String): Option[Decl] =
    v.split(Us.toString, -1) match {
      case Array(fk, dim, pk, fv, dv) =>
        Some(Decl(fk.split(",").toSeq, dim, pk.split(",").toSeq,
          fv.toLong, dv.toLong))
      case _ => None
    }

  private[graft] def declsIn(props: Map[String, String]): Seq[Decl] =
    props.toSeq.filter(_._1.startsWith(Prefix)).sortBy(_._1)
      .flatMap(kv => parse(kv._2))

  /** Declare (and VALIDATE) `factPath(fkCols) REFERENCES dimPath(pkCols)`.
    * Returns the fact version carrying the pin. The validation reads both
    * tables once (column-pruned); the props commit lands only if the fact
    * is still at the validated base — a racing data commit re-validates
    * and retries, so the pin can never vouch for unchecked rows. */
  def declare(spark: SparkSession, factPath: String, fkCols: Seq[String],
      dimPath: String, pkCols: Seq[String]): Long = {
    require(fkCols.nonEmpty && fkCols.size == pkCols.size,
      s"$factPath: FOREIGN KEY needs matching fact/dim column lists " +
        s"(got ${fkCols.size} vs ${pkCols.size})")
    var attempts = 0
    while (true) {
      attempts += 1
      val factV = VersionedTable.latestVersion(spark, factPath).getOrElse(
        throw new IllegalArgumentException(
          s"$factPath has no committed versions"))
      val dimV = VersionedTable.latestVersion(spark, dimPath).getOrElse(
        throw new IllegalArgumentException(
          s"$dimPath has no committed versions"))
      validate(spark, factPath, factV, fkCols, dimPath, dimV, pkCols)
      // the props commit this pin rides is FILE-IDENTICAL to the validated
      // base, so integrity at factV+1 is integrity at factV — and the
      // expectedBase precondition makes that identity a checked fact, not
      // an assumption
      val decl = Decl(fkCols, dimPath, pkCols, factV + 1L, dimV)
      try {
        return VersionedTable.setPropertiesExpecting(spark, factPath,
          Map(keyFor(fkCols) -> serialize(decl)), expectedBase = factV)
      } catch {
        case _: VersionedTable.ConcurrentTxnException if attempts < 5 => ()
      }
    }
    -1L // unreachable
  }

  /** Drop a declared key set (props-only commit; elimination disarms). */
  def drop(spark: SparkSession, factPath: String, fkCols: Seq[String]): Long =
    VersionedTable.setProperties(spark, factPath, Map.empty,
      unset = Seq(keyFor(fkCols)))

  case class UniqueDecl(cols: Seq[String], pin: Long)

  def uniqueKeyFor(cols: Seq[String]): String =
    UniquePrefix + cols.mkString("~")

  private[graft] def serializeUnique(d: UniqueDecl): String =
    Seq(d.cols.mkString(","), d.pin.toString).mkString(Us.toString)

  private[graft] def parseUnique(v: String): Option[UniqueDecl] =
    v.split(Us.toString, -1) match {
      case Array(cols, pin) =>
        Some(UniqueDecl(cols.split(",").toSeq, pin.toLong))
      case _ => None
    }

  private[graft] def uniqueDeclsIn(props: Map[String, String]): Seq[UniqueDecl] =
    props.toSeq.filter(_._1.startsWith(UniquePrefix)).sortBy(_._1)
      .flatMap(kv => parseUnique(kv._2))

  /** Declare (and VALIDATE) `cols` UNIQUE on `path` — one column-pruned
    * aggregate over the table; the pin rides a file-identical props commit
    * under the same expected-base precondition as [[declare]]. */
  def declareUnique(spark: SparkSession, path: String,
      cols: Seq[String]): Long = {
    require(cols.nonEmpty, s"$path: UNIQUE needs at least one column")
    var attempts = 0
    while (true) {
      attempts += 1
      val v = VersionedTable.latestVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(
          s"$path has no committed versions"))
      val df = VersionedTable.read(spark, path, Some(v))
      val miss = cols.filterNot(df.columns.contains)
      require(miss.isEmpty,
        s"$path: UNIQUE names missing column(s): ${miss.mkString(",")}")
      val dupes = df.groupBy(cols.map(col): _*)
        .count().filter(col("count") > 1L).limit(1).count()
      require(dupes == 0L,
        s"$path: (${cols.mkString(",")}) is not unique at version $v — " +
          "declaration refused")
      try {
        return VersionedTable.setPropertiesExpecting(spark, path,
          Map(uniqueKeyFor(cols) ->
            serializeUnique(UniqueDecl(cols, v + 1L))), expectedBase = v)
      } catch {
        case _: VersionedTable.ConcurrentTxnException if attempts < 5 => ()
      }
    }
    -1L // unreachable
  }

  def dropUnique(spark: SparkSession, path: String,
      cols: Seq[String]): Long =
    VersionedTable.setProperties(spark, path, Map.empty,
      unset = Seq(uniqueKeyFor(cols)))

  private def validate(spark: SparkSession, factPath: String, factV: Long,
      fkCols: Seq[String], dimPath: String, dimV: Long,
      pkCols: Seq[String]): Unit = {
    val fact = VersionedTable.read(spark, factPath, Some(factV))
    val dim = VersionedTable.read(spark, dimPath, Some(dimV))
    val missF = fkCols.filterNot(fact.columns.contains)
    val missD = pkCols.filterNot(dim.columns.contains)
    require(missF.isEmpty && missD.isEmpty,
      s"$factPath: FOREIGN KEY names missing column(s): " +
        s"${(missF ++ missD).mkString(",")}")
    val dupes = dim.groupBy(pkCols.map(col): _*)
      .count().filter(col("count") > 1L).limit(1).count()
    require(dupes == 0L,
      s"$factPath: REFERENCES ${dimPath}(${pkCols.mkString(",")}) is not " +
        s"unique at version $dimV — a foreign key needs a true key")
    val nulls = fact.filter(fkCols.map(col(_).isNull).reduce(_ || _))
      .limit(1).count()
    require(nulls == 0L,
      s"$factPath: FOREIGN KEY (${fkCols.mkString(",")}) has NULL value(s) " +
        s"at version $factV — join elimination needs every fact row to " +
        "match exactly once; filter or coalesce nulls first")
    // every fact key present in the dim: one shuffled anti-join, the only
    // O(fact)+O(dim) step — the price of a checked RELY
    val orphans = fact.select(fkCols.map(col): _*)
      .join(dim.select(pkCols.map(col): _*)
          .toDF(fkCols: _*), fkCols, "left_anti")
      .limit(1).count()
    require(orphans == 0L,
      s"$factPath: FOREIGN KEY (${fkCols.mkString(",")}) has value(s) " +
        s"absent from ${dimPath}(${pkCols.mkString(",")}) at versions " +
        s"($factV, $dimV) — integrity does not hold, declaration refused")
  }
}
