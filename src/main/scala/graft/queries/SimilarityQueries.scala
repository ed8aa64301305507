package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (vec_id, embedding array<float>, label).
  *
  * q_cosine_topk is the brute-force baseline: a bounded query set (the
  * driver/probe side, broadcast) against the full corpus — at cluster scale
  * the corpus side stays partitioned and never shuffles; cost is
  * |queries| × |corpus| dot products with no candidate materialization
  * beyond the window's per-partition top-k. The IVF/LSH-bucketed scale path
  * lands in a follow-up round.
  */
object SimilarityQueries {

  /** Norms are precomputed per side BEFORE the join — N+Q norm computations
    * instead of N×Q. */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    // single-row-group parquet → one split; spread the streamed corpus side
    // (no-op on properly-split inputs)
    val corpus = Tables.spread(emb)
      .select(col("vec_id").as("nbr_id"), col("v").as("cv"), col("nrm").as("cn"))

    val scored = broadcast(queries)
      .join(corpus, col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("nbr_id"), col("cosine"))
  }

  /** Oracle replicates the same double-precision dot/norm formula via
    * DuckDB list lambdas (list_cosine_similarity would accumulate in a
    * different order/precision). */
  val cosineTopKSql: String =
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
      |    ROUND(list_sum(list_transform(range(1, 65),
      |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cosine
      |  FROM n q JOIN n c ON q.vec_id < 50 AND q.vec_id <> c.vec_id)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rk,
      |  nbr_id, cosine
      |FROM scored
      |QUALIFY rk <= 5""".stripMargin

  // --------------------------------------------------------------------------
  // q_ann_ivf — IVF-bucketed ANN: the 100 TB scale path. Index build:
  // seed centroids = the first K corpus vectors, refined by ONE Lloyd
  // (k-means) iteration; search: a query probes only its nprobe nearest
  // buckets, so cost is |queries| × (corpus/K × nprobe) instead of
  // |queries| × corpus, with exact cosine re-ranking inside the probed
  // buckets.
  //
  // Centroids live on the DRIVER (a bounded K×dim artifact — the standard
  // IVF index layout) and enter the plan as literals, so per-vector bucket
  // assignment is a NARROW argmax over an array-of-structs column: zero
  // joins, zero explode, zero shuffle, whole-stage codegen dot products.
  // (The previous formulation joined every vector against all K broadcast
  // centroids — a K× row explode — then took the argmax with a row_number
  // window, i.e. a full shuffle of N×K rows to pick a max over K values
  // already computable in one row. PlanAuditSpec now asserts the
  // assignment subtree is exchange/window/generate-free.)
  //
  // Determinism of the Lloyd step across engines: per-bucket element sums
  // quantize values to integer MICROS (exact, order-independent integer
  // addition in any partition order — a raw double sum would be
  // order-dependent), and the mean is (sum/1e6)/count in double on both
  // sides. Quantizing the MEAN's inputs is harmless to the index (the
  // centroid is an approximation by construction); corpus vectors and the
  // final cosines are never quantized.
  // --------------------------------------------------------------------------
  val NumCentroids = 8
  val NumProbes = 2
  val AnnTopK = 3

  /** (bucket id, centroid vector, centroid norm). */
  final case class Centroid(id: Int, v: Array[Double], nrm: Double)

  /** Sequential sum-of-squares fold — matches the oracle's
    * list_sum(list_transform(v, x -> x*x)) accumulation order. */
  private def seqNorm(v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** Rounded cosine vs each centroid as array<struct<cos,negk>>; argmax =
    * array_max (max cos, ties to the SMALLEST bucket id via negated key) —
    * all narrow expressions. */
  private def centroidCandidates(cents: Seq[Centroid]): Column =
    array(cents.map { c =>
      struct(
        round(dot(col("v"), typedLit(c.v.toSeq)) / (col("nrm") * lit(c.nrm)), 6).as("cos"),
        lit(-c.id).as("negk"))
    }: _*)

  /** Adds `bucket` — nearest centroid id — to a (vec_id, v, nrm) frame as a
    * pure narrow projection. Public so PlanAuditSpec can assert the plan. */
  def assignBuckets(emb: DataFrame, cents: Seq[Centroid]): DataFrame =
    emb.withColumn("cand", centroidCandidates(cents))
      .withColumn("bucket", -array_max(col("cand")).getField("negk"))

  /** Distributed k-means index build: seed with the first k vectors, refine
    * with `iters` Lloyd iterations (each one distributed assign + grouped
    * sums; only the K×dim centroid table ever reaches the driver). The
    * declared q_ann_ivf pins iters=1 to match its oracle; callers building a
    * real index run it to convergence. `emb` should be cached — each
    * iteration re-scans it, the canonical iterative-ML working-set shape. */
  def kmeans(emb: DataFrame, k: Int, iters: Int): Seq[Centroid] =
    kmeansSeeded(emb, col("vec_id") < k, iters)

  /** As [[kmeans]] with an explicit seed predicate — the persisted-index
    * build seeds from the first k CORPUS vectors, which are not the first
    * k vec_ids when the corpus is a filtered view of the table. */
  def kmeansSeeded(emb: DataFrame, seedPred: Column, iters: Int): Seq[Centroid] = {
    val seeds = emb.filter(seedPred).select(col("vec_id"), col("v"))
      .collect()
      .map { r =>
        val v = r.getAs[scala.collection.Seq[Double]]("v").toArray
        Centroid(r.getAs[Number]("vec_id").intValue, v, seqNorm(v))
      }.toSeq.sortBy(_.id)
    (1 to iters).foldLeft(seeds)((c, _) => lloydRefine(emb, c))
  }

  /** One Lloyd iteration: assign to seeds, recompute per-bucket element-wise
    * means (micros-quantized sums → exact + order-independent), collect the
    * K×dim result to the driver. Empty buckets drop out (both engines agree
    * by construction). */
  private def lloydRefine(emb: DataFrame, seeds: Seq[Centroid]): Seq[Centroid] = {
    val sums = assignBuckets(emb, seeds)
      .select(col("bucket"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("bucket"), col("pos"))
      .agg(sum(expr("CAST(ROUND(x * 1000000) AS BIGINT)")).as("s"),
        count(lit(1)).as("cnt"))
      .collect()
    sums.groupBy(_.getAs[Number]("bucket").intValue).toSeq.map { case (b, rows) =>
      val vec = rows.sortBy(_.getAs[Number]("pos").intValue)
        .map(r => (r.getAs[Long]("s").toDouble / 1e6) / r.getAs[Long]("cnt").toDouble)
        .toArray
      Centroid(b, vec, seqNorm(vec))
    }.sortBy(_.id)
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    annIvf(spark, dir, NumCentroids, NumProbes)

  def annIvf(spark: SparkSession, dir: String, k: Int, nprobe: Int): DataFrame = {
    // the corpus feeds three passes (seed fetch, Lloyd sums, final
    // assignment+search) — cache it for the build, the standard iterative
    // k-means working-set pattern (at real scale this is exactly the frame
    // you'd persist during index construction)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .cache()
    // index build: tiny driver-side jobs (seed fetch reads K rows with
    // pushdown; each Lloyd collect is K×dim grouped sums) — NOT a data-sized
    // collect; the index is a bounded driver artifact like any ANN index
    val cents = kmeans(emb, k, iters = 1)

    val assignedAll = assignBuckets(emb, cents)
    val corpus = assignedAll.select(col("vec_id").as("nbr_id"), col("v").as("nv"),
      col("nrm").as("nn"), col("bucket"))
    // probe expansion only on the (tiny) query side: top-nprobe buckets via
    // a per-row array sort of the K candidate structs — still narrow
    val probes = assignedAll.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(slice(reverse(array_sort(col("cand"))), 1, nprobe)).as("pr"))
      .withColumn("probe", -col("pr.negk"))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    probes.join(corpus,
        col("bucket") === col("probe") && col("nbr_id") =!= col("query_id"))
      .withColumn("cosine", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= AnnTopK)
      .select(col("query_id"), col("rk"), col("nbr_id"), col("cosine"))
  }

  val annIvfSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v),
       |seeds AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $NumCentroids),
       |s1 AS (
       |  SELECT n.vec_id, n.v, c.cent_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(n.v) + 1),
       |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cn), 6) AS cent_cos
       |  FROM n CROSS JOIN seeds c),
       |a1 AS (
       |  SELECT vec_id, v, cent_id AS bucket,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cent_cos DESC, cent_id ASC) AS crn
       |  FROM s1),
       |asg1 AS (SELECT vec_id, v, bucket FROM a1 WHERE crn = 1),
       |means AS (
       |  SELECT bucket, t.i AS i,
       |    SUM(CAST(ROUND(v[t.i] * 1000000) AS BIGINT)) AS s, COUNT(*) AS cnt
       |  FROM asg1 CROSS JOIN range(1, 65) t(i)
       |  GROUP BY bucket, t.i),
       |cents2 AS (
       |  SELECT bucket, list((CAST(s AS DOUBLE) / 1000000.0) / cnt ORDER BY i) AS cv
       |  FROM means GROUP BY bucket),
       |c2n AS (
       |  SELECT bucket, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn
       |  FROM cents2),
       |s2 AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.bucket AS cent_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(n.v) + 1),
       |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cn), 6) AS cent_cos
       |  FROM n CROSS JOIN c2n c),
       |a2 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY cent_cos DESC, cent_id ASC) AS crn
       |  FROM s2),
       |assigned AS (
       |  SELECT vec_id AS nbr_id, v AS nv, nrm AS nn, cent_id AS bucket
       |  FROM a2 WHERE crn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cent_id AS probe
       |  FROM a2 WHERE vec_id >= 50 AND vec_id < 60 AND crn <= $NumProbes),
       |cand AS (
       |  SELECT p.query_id, a.nbr_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(p.qv) + 1),
       |      i -> p.qv[i] * a.nv[i])) / (p.qn * a.nn), 6) AS cosine
       |  FROM probes p JOIN assigned a
       |    ON a.bucket = p.probe AND a.nbr_id <> p.query_id)
       |SELECT query_id,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rk,
       |  nbr_id, cosine
       |FROM cand
       |QUALIFY rk <= $AnnTopK""".stripMargin

  // --------------------------------------------------------------------------
  // q_ann_lsh — random-hyperplane LSH ANN: each vector's bucket is the sign
  // pattern of dot products against NumPlanes fixed hyperplanes, so
  // neighbors land in the same bucket with probability rising in their
  // cosine. Search touches one bucket (corpus/2^planes of the data) with
  // exact re-ranking inside. Hyperplane coefficients are derived
  // deterministically from md5 on the DRIVER and embedded as literals in
  // both the Spark plan and the oracle SQL — no runtime randomness.
  // --------------------------------------------------------------------------
  val NumPlanes = 8
  val LshTopK = 3

  /** 64 deterministic pseudo-random coefficients per plane from md5 hex
    * pairs, centered on zero (exact halves — bit-identical as SQL literals). */
  lazy val planes: Seq[Array[Double]] = {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    (0 until NumPlanes).map { p =>
      val hex = (0 until 4).map(b => md5hex(s"plane$p-$b")).mkString
      Array.tabulate(64)(d =>
        Integer.parseInt(hex.substring(d * 2, d * 2 + 2), 16) - 127.5)
    }
  }

  private def bucketExpr(v: Column): Column =
    (0 until NumPlanes).map { p =>
      when(dot(typedLit(planes(p).toSeq), v) >= 0.0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread: A/B-measured neutral-to-slower at this corpus size
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("bucket", bucketExpr(col("v")))
    val corpus = emb.select(col("vec_id").as("nbr_id"), col("v").as("nv"),
      col("nrm").as("nn"), col("bucket"))
    val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    queries.join(corpus, Seq("bucket"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= LshTopK)
      .select(col("query_id"), col("rk"), col("nbr_id"), col("cosine"))
  }

  lazy val annLshSql: String = {
    def lit64(a: Array[Double]): String = a.mkString("[", ", ", "]")
    val bucketTerms = (0 until NumPlanes).map { p =>
      s"""(CASE WHEN list_sum(list_transform(range(1, LEN(v) + 1),
         |  i -> (${lit64(planes(p))})[i] * v[i])) >= 0.0 THEN ${1 << p} ELSE 0 END)"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(" + ")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
       |    $bucketTerms AS bucket
       |  FROM v),
       |cand AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(q.v) + 1),
       |      i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id >= 100 AND q.vec_id < 120)
       |SELECT query_id,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rk,
       |  nbr_id, cosine
       |FROM cand
       |QUALIFY rk <= $LshTopK""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_ann_recall — recall@k of the IVF index against the brute-force ground
  // truth for the same query set: the approximation-quality measurement an
  // ANN deployment ships with. The exact side reuses the broadcast-queries /
  // partitioned-corpus brute-force shape (bounded query side ⇒ the corpus
  // never shuffles); the ANN side is the declared q_ann_ivf plan; recall is
  // a semi-join + per-query count. Exactly divides by k ⇒ recall values are
  // k+1 representable doubles, hash-stable across engines.
  // --------------------------------------------------------------------------
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val queries = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val corpus = Tables.spread(emb)
      .select(col("vec_id").as("nbr_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val exact = broadcast(queries)
      .join(corpus, col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= AnnTopK)
      .select(col("query_id"), col("nbr_id"))
    val ann = annIvf(spark, dir).select(col("query_id"), col("nbr_id"))
    val matched = exact.join(ann, Seq("query_id", "nbr_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_matched"))
    queries.select(col("query_id"))
      .join(matched, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)).cast("double") / AnnTopK).as("recall"))
  }

  lazy val annRecallSql: String =
    s"""WITH ivf AS (
       |$annIvfSql
       |),
       |v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
       |    ROUND(list_sum(list_transform(range(1, 65),
       |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c ON q.vec_id >= 50 AND q.vec_id < 60 AND q.vec_id <> c.vec_id),
       |exact AS (
       |  SELECT query_id, nbr_id FROM (
       |    SELECT query_id, nbr_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rk
       |    FROM scored)
       |  WHERE rk <= $AnnTopK),
       |matched AS (
       |  SELECT e.query_id, COUNT(*) AS n_matched
       |  FROM exact e
       |  WHERE EXISTS (SELECT 1 FROM ivf i
       |                WHERE i.query_id = e.query_id AND i.nbr_id = e.nbr_id)
       |  GROUP BY e.query_id)
       |SELECT q.vec_id AS query_id,
       |  COALESCE(m.n_matched, 0) AS n_matched,
       |  CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / $AnnTopK AS recall
       |FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 50 AND vec_id < 60) q
       |LEFT JOIN matched m ON m.query_id = q.vec_id""".stripMargin

  // --------------------------------------------------------------------------
  // q_ann_incremental — the PERSISTED IVF index: the operational shape that
  // makes ANN viable at 100 TB. q_ann_ivf re-clusters the corpus per run;
  // here the index is built ONCE into two graft tables — `centroids` (the
  // K×dim artifact) and `assignments` (vec_id, v, nrm, bucket — the
  // inverted lists, with manifest stats on `bucket` so a probe's scan
  // prunes to its buckets' files once the table is clustered by bucket) —
  // and every subsequent batch only PROBES it: load K centroids (bounded
  // collect, like any ANN index), assign the batch with a narrow argmax,
  // broadcast the tiny probe side into the assignments scan, exact cosine
  // re-rank inside the probed buckets. New vectors are folded in by
  // annIndexAppend (assign with the STORED centroids, append — no
  // re-cluster), and annIndexRecluster is the periodic maintenance verb
  // (Lloyd passes seeded by the stored centroids, then one re-assignment
  // rewrite). Same pattern as q_incremental_dedup's persisted band index.
  //
  // The oracle replays the build deterministically (corpus k-means with
  // the q_ann_ivf micros-quantized Lloyd step, seeded by the first K
  // corpus vectors) and then the probe, so a green row proves the
  // persisted index holds exactly the index the build computed AND that
  // the probe reads it faithfully. AnnIndexSpec proves the incremental
  // contract: queries and appends never bump the centroids table version
  // (the corpus is never re-clustered per batch).
  // --------------------------------------------------------------------------
  val AnnIncrMod = 10L
  val AnnIncrQueryMax = 200L

  /** Fixture root (fingerprint-keyed on the source parquet): `centroids`
    * and `assignments` graft tables live under it. */
  def annIndexRoot(dir: String): String =
    SkippingQueries.cachedFixturePath(dir, "annindex_v1", "embeddings.parquet")

  /** (vec_id, v double[], nrm) for the whole embeddings table. NOT spread:
    * A/B-measured slower across the ANN family — at 2000 vectors the extra
    * AQE exchange stage costs more than single-task norms, and the probe
    * paths broadcast the query side anyway. */
  private def embFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  private def centroidDf(spark: SparkSession, cents: Seq[Centroid]): DataFrame = {
    import spark.implicits._
    cents.map(c => (c.id, c.v.toSeq, c.nrm)).toDF("id", "v", "nrm")
  }

  /** The K stored centroids — a bounded collect (the index artifact every
    * IVF deployment loads before probing), never data-sized. */
  def loadCentroids(spark: SparkSession, centPath: String): Seq[Centroid] =
    graft.sources.VersionedTable.read(spark, centPath).collect().map { r =>
      Centroid(r.getAs[Number]("id").intValue,
        r.getAs[scala.collection.Seq[Double]]("v").toArray,
        r.getAs[Double]("nrm"))
    }.toSeq.sortBy(_.id)

  /** Generic index build: k-means the (cached) corpus with `seedPred`
    * seeds and `iters` micros-quantized Lloyd passes, then persist
    * `centroids` and `assignments` as graft tables. Idempotent and
    * crash-resumable — each table is skipped when already committed, and
    * assignments are always derived from the STORED centroids so a resume
    * after a crash between the two writes stays consistent. */
  def buildAnnIndex(corpus: DataFrame, seedPred: Column,
      centPath: String, asgPath: String, iters: Int = 1): (Long, Long) = {
    import graft.sources.VersionedTable
    val spark = corpus.sparkSession
    val cv = VersionedTable.latestVersion(spark, centPath).getOrElse {
      VersionedTable.write(
        centroidDf(spark, kmeansSeeded(corpus, seedPred, iters)), centPath)
    }
    val av = VersionedTable.latestVersion(spark, asgPath).getOrElse {
      VersionedTable.write(
        assignBuckets(corpus, loadCentroids(spark, centPath))
          .select(col("vec_id"), col("v"), col("nrm"), col("bucket")),
        asgPath, statsCols = Seq("bucket"))
    }
    (cv, av)
  }

  /** The declared fixture build over the CORPUS residues (vec_id not ≡ 0
    * mod [[AnnIncrMod]]; the ≡ 0 residue plays "new batch"), seeded by the
    * first K corpus vectors (vec_ids 1..K — none are ≡ 0 mod 10 for
    * K ≤ 9). */
  def ensureAnnIndex(spark: SparkSession, dir: String): (String, String) = {
    import graft.sources.VersionedTable
    val rootDir = annIndexRoot(dir)
    val centPath = s"$rootDir/centroids"
    val asgPath = s"$rootDir/assignments"
    if (VersionedTable.latestVersion(spark, centPath).isEmpty ||
        VersionedTable.latestVersion(spark, asgPath).isEmpty) {
      val corpus = embFrame(spark, dir)
        .filter(col("vec_id") % AnnIncrMod =!= 0).cache()
      try buildAnnIndex(corpus,
        col("vec_id") >= 1 && col("vec_id") <= NumCentroids,
        centPath, asgPath, iters = 1)
      finally corpus.unpersist()
    }
    (centPath, asgPath)
  }

  /** Fold a batch into the index WITHOUT re-clustering: assign with the
    * stored centroids (narrow argmax), append to the assignments table.
    * Returns the new assignments version; the centroids version does not
    * move — AnnIndexSpec pins that. */
  def annIndexAppend(spark: SparkSession, batch: DataFrame,
      centPath: String, asgPath: String): Long = {
    val cents = loadCentroids(spark, centPath)
    graft.sources.VersionedTable.append(
      assignBuckets(batch, cents)
        .select(col("vec_id"), col("v"), col("nrm"), col("bucket")),
      asgPath, statsCols = Seq("bucket"))
  }

  /** Periodic maintenance: refine the stored centroids with `iters` Lloyd
    * passes over the CURRENT assignments, then rewrite both tables (new
    * centroid version, full re-assignment). This is the only operation
    * that re-clusters — it runs on a schedule, never per batch. */
  def annIndexRecluster(spark: SparkSession, centPath: String,
      asgPath: String, iters: Int = 1): (Long, Long) = {
    import graft.sources.VersionedTable
    val emb = VersionedTable.read(spark, asgPath)
      .select(col("vec_id"), col("v"), col("nrm")).cache()
    try {
      val cents = (1 to iters).foldLeft(loadCentroids(spark, centPath))(
        (c, _) => lloydRefine(emb, c))
      val cv = VersionedTable.write(centroidDf(spark, cents), centPath)
      val av = VersionedTable.write(
        assignBuckets(emb, cents)
          .select(col("vec_id"), col("v"), col("nrm"), col("bucket")),
        asgPath, statsCols = Seq("bucket"))
      (cv, av)
    } finally emb.unpersist()
  }

  /** The probe: batch vectors (vec_id ≡ 0 mod [[AnnIncrMod]], below
    * [[AnnIncrQueryMax]]) search the PERSISTED index — no k-means in this
    * path. The probe side is broadcast (|queries|×nprobe rows); the
    * assignments scan never shuffles. */
  def annIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (centPath, asgPath) = ensureAnnIndex(spark, dir)
    val batch = embFrame(spark, dir)
      .filter(col("vec_id") % AnnIncrMod === 0 &&
        col("vec_id") < AnnIncrQueryMax)
    annIndexProbe(batch, centPath, asgPath, NumProbes, AnnTopK)
  }

  /** Generic probe of a persisted index: assign `queries` (vec_id, v, nrm)
    * with the stored centroids, broadcast the |queries|×nprobe probe side
    * into the assignments scan, exact-cosine re-rank to `topK`. No k-means
    * anywhere in this path. */
  def annIndexProbe(queries: DataFrame, centPath: String, asgPath: String,
      nprobe: Int, topK: Int): DataFrame = {
    val spark = queries.sparkSession
    val cents = loadCentroids(spark, centPath)
    val probes = assignBuckets(queries, cents)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(slice(reverse(array_sort(col("cand"))), 1, nprobe)).as("pr"))
      .withColumn("probe", -col("pr.negk"))
    val corpus = graft.sources.VersionedTable.read(spark, asgPath)
      .select(col("vec_id").as("nbr_id"), col("v").as("nv"),
        col("nrm").as("nn"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    // self-guard is a no-op against the freshly-built fixture index (batch
    // ids are not in the corpus) but keeps the probe correct after appends
    broadcast(probes)
      .join(corpus, col("bucket") === col("probe") &&
        col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("nbr_id"), col("cosine"))
  }

  /** Oracle: replay the corpus-only build (seed vec_ids 1..K, one
    * micros-quantized Lloyd pass — the q_ann_ivf recipe restricted to the
    * corpus residues), then the batch probe against it. */
  lazy val annIncrementalSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v),
       |corpus AS (SELECT * FROM n WHERE vec_id % $AnnIncrMod <> 0),
       |seeds AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n
       |  WHERE vec_id >= 1 AND vec_id <= $NumCentroids),
       |s1 AS (
       |  SELECT c0.vec_id, c0.v, c.cent_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(c0.v) + 1),
       |      i -> c0.v[i] * c.cv[i])) / (c0.nrm * c.cn), 6) AS cent_cos
       |  FROM corpus c0 CROSS JOIN seeds c),
       |a1 AS (
       |  SELECT vec_id, v, cent_id AS bucket,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cent_cos DESC, cent_id ASC) AS crn
       |  FROM s1),
       |asg1 AS (SELECT vec_id, v, bucket FROM a1 WHERE crn = 1),
       |means AS (
       |  SELECT bucket, t.i AS i,
       |    SUM(CAST(ROUND(v[t.i] * 1000000) AS BIGINT)) AS s, COUNT(*) AS cnt
       |  FROM asg1 CROSS JOIN range(1, 65) t(i)
       |  GROUP BY bucket, t.i),
       |cents2 AS (
       |  SELECT bucket, list((CAST(s AS DOUBLE) / 1000000.0) / cnt ORDER BY i) AS cv
       |  FROM means GROUP BY bucket),
       |c2n AS (
       |  SELECT bucket, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn
       |  FROM cents2),
       |s2 AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.bucket AS cent_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(n.v) + 1),
       |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cn), 6) AS cent_cos
       |  FROM n CROSS JOIN c2n c),
       |a2 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY cent_cos DESC, cent_id ASC) AS crn
       |  FROM s2),
       |assigned AS (
       |  SELECT vec_id AS nbr_id, v AS nv, nrm AS nn, cent_id AS bucket
       |  FROM a2 WHERE crn = 1 AND vec_id % $AnnIncrMod <> 0),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cent_id AS probe
       |  FROM a2 WHERE vec_id % $AnnIncrMod = 0 AND vec_id < $AnnIncrQueryMax
       |    AND crn <= $NumProbes),
       |cand AS (
       |  SELECT p.query_id, a.nbr_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(p.qv) + 1),
       |      i -> p.qv[i] * a.nv[i])) / (p.qn * a.nn), 6) AS cosine
       |  FROM probes p JOIN assigned a
       |    ON a.bucket = p.probe AND a.nbr_id <> p.query_id)
       |SELECT query_id,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rk,
       |  nbr_id, cosine
       |FROM cand
       |QUALIFY rk <= $AnnTopK""".stripMargin

  // --------------------------------------------------------------------------
  // q_ann_pq — IVF-PQ (product quantization): the MEMORY-BOUNDED ANN shape
  // 100 TB of embeddings actually needs. The persisted IVF index stores
  // full float vectors; PQ stores M=8 one-byte codes per vector plus an
  // M×K×(dim/M) codebook (a bounded driver artifact) — ~64× smaller than
  // the raw 64-double vectors.
  //
  // TRAIN (deterministic, the IVF recipe per SUBSPACE): each vector splits
  // into M contiguous subvectors; per subspace, seeds = the first PqK
  // corpus vectors' subvectors (code id = vec_id), refined by ONE
  // micros-quantized Lloyd step on squared-L2 assignment (integer sums ⇒
  // order-independent ⇒ engine-identical codewords). ENCODE: per
  // subspace, the nearest codeword id (round-6 L2², ties to the smallest
  // id) — a NARROW argmin over literal candidates, zero joins/shuffles.
  // Codebooks and codes persist as graft tables (the index).
  //
  // SEARCH (asymmetric distance): candidates are scored against the
  // RECONSTRUCTION x̂ (the M codewords concatenated — decoding from the
  // codes table + broadcast codebook literals, never touching raw
  // vectors), with the same round-6 cosine both engines already agree
  // on; the top-[[PqShortlist]] per query then re-rank EXACTLY by
  // fetching true vectors for just the shortlist. The gated output is
  // recall@k of the PQ result vs the brute-force ground truth — the
  // approximation-quality number a PQ deployment ships with — and the
  // DuckDB oracle replays train + encode + search + ground truth end to
  // end, so a green row proves the whole quantization pipeline is
  // engine-exact.
  // --------------------------------------------------------------------------
  val PqM = 8         // subspaces (embedding dim 64 → 8 dims each)
  val PqSubDim = 8
  val PqK = 16        // codewords per subspace
  val PqShortlist = 24 // approx candidates per query before exact re-rank

  /** One codeword: subspace `m`, code id `c`, the sub-vector. */
  final case class Codeword(m: Int, c: Int, v: Array[Double])

  /** Nearest-codeword id for subspace `m` of column `v`: round-6 squared
    * L2 to each codeword as array<struct<d,c>>, array_min = smallest
    * distance, ties to the smallest code id — all narrow expressions
    * (the IVF argmax trick, argmin-flavored). */
  private def pqCodeExpr(cws: Seq[Codeword], m: Int): Column = {
    val sv = slice(col("v"), m * PqSubDim + 1, PqSubDim)
    val cand = array(cws.filter(_.m == m).sortBy(_.c).map { cw =>
      struct(round(l2sq(sv, typedLit(cw.v.toSeq)), 6).as("d"),
        lit(cw.c).as("c"))
    }: _*)
    array_min(cand).getField("c")
  }

  /** All M per-row codes as one array<int> column — one narrow projection
    * over the corpus, no explode, no shuffle. */
  def pqCodesExpr(cws: Seq[Codeword]): Column =
    array((0 until PqM).map(m => pqCodeExpr(cws, m)): _*)

  /** Train the M codebooks: driver-side seeds (PqK × dim values), then ONE
    * distributed Lloyd pass — per-row codes for every subspace (narrow),
    * micros-quantized element sums per (subspace, code, position), and
    * only the M×K×subDim codebook ever reaches the driver. Empty codewords
    * drop (both engines agree by construction). */
  def pqTrain(emb: DataFrame): Seq[Codeword] = {
    val seeds: Seq[Codeword] = emb.filter(col("vec_id") < PqK)
      .select(col("vec_id"), col("v")).collect().toSeq
      .flatMap { r =>
        val v = r.getAs[scala.collection.Seq[Double]]("v").toArray
        val c = r.getAs[Number]("vec_id").intValue
        (0 until PqM).map(m =>
          Codeword(m, c, v.slice(m * PqSubDim, (m + 1) * PqSubDim)))
      }
    val sums = emb.withColumn("codes", pqCodesExpr(seeds))
      .select(col("codes"), posexplode(col("v")).as(Seq("pos", "x")))
      .withColumn("m", (col("pos") / PqSubDim).cast("int"))
      .withColumn("code", element_at(col("codes"), col("m") + 1))
      .groupBy(col("m"), col("code"), col("pos"))
      .agg(sum(expr("CAST(ROUND(x * 1000000) AS BIGINT)")).as("s"),
        count(lit(1)).as("cnt"))
      .collect()
    sums.groupBy(r => (r.getAs[Int]("m"), r.getAs[Int]("code"))).toSeq
      .map { case ((m, c), rows) =>
        val vec = rows.sortBy(_.getAs[Int]("pos"))
          .map(r => (r.getAs[Long]("s").toDouble / 1e6) /
            r.getAs[Long]("cnt").toDouble)
          .toArray
        Codeword(m, c, vec)
      }.sortBy(cw => (cw.m, cw.c))
  }

  def pqIndexRoot(dir: String): String =
    SkippingQueries.cachedFixturePath(dir, "pqindex_v1", "embeddings.parquet")

  private def codewordDf(spark: SparkSession, cws: Seq[Codeword]): DataFrame = {
    import spark.implicits._
    cws.map(cw => (cw.m, cw.c, cw.v.toSeq)).toDF("m", "c", "cw")
  }

  def loadCodebooks(spark: SparkSession, cbPath: String): Seq[Codeword] =
    graft.sources.VersionedTable.read(spark, cbPath).collect().map { r =>
      Codeword(r.getAs[Number]("m").intValue, r.getAs[Number]("c").intValue,
        r.getAs[scala.collection.Seq[Double]]("cw").toArray)
    }.toSeq.sortBy(cw => (cw.m, cw.c))

  /** Build (idempotent, crash-resumable like [[buildAnnIndex]]): train the
    * codebooks into `codebooks`, encode the corpus into `codes` — both
    * graft tables; codes always derive from the STORED codebooks so a
    * resume stays consistent. The pair IS the index: M ints per vector +
    * the bounded codebook vs dim doubles per vector raw. */
  def buildPqIndex(corpus: DataFrame, cbPath: String, codesPath: String)
      : (Long, Long) = {
    import graft.sources.VersionedTable
    val spark = corpus.sparkSession
    val cv = VersionedTable.latestVersion(spark, cbPath).getOrElse {
      VersionedTable.write(codewordDf(spark, pqTrain(corpus)), cbPath)
    }
    val xv = VersionedTable.latestVersion(spark, codesPath).getOrElse {
      VersionedTable.write(
        corpus.withColumn("codes", pqCodesExpr(loadCodebooks(spark, cbPath)))
          .select(col("vec_id"), col("codes")),
        codesPath, statsCols = Seq("vec_id"))
    }
    (cv, xv)
  }

  /** Decode x̂ from the codes column: per subspace a map-literal lookup
    * code → codeword, flattened back to dim doubles — the asymmetric-
    * distance reconstruction, computed from the INDEX alone. */
  def pqDecodeExpr(cws: Seq[Codeword]): Column =
    flatten(array((0 until PqM).map { m =>
      val lut = typedLit(cws.filter(_.m == m).map(cw => cw.c -> cw.v.toSeq).toMap)
      element_at(lut, element_at(col("codes"), m + 1))
    }: _*))

  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val root = pqIndexRoot(dir)
    val cbPath = s"$root/codebooks"; val codesPath = s"$root/codes"
    if (graft.sources.VersionedTable.latestVersion(spark, cbPath).isEmpty ||
        graft.sources.VersionedTable.latestVersion(spark, codesPath).isEmpty) {
      val corpus = embFrame(spark, dir).cache()
      try buildPqIndex(corpus, cbPath, codesPath)
      finally corpus.unpersist()
    }
    val cws = loadCodebooks(spark, cbPath)
    val emb = embFrame(spark, dir)
    val queries = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    // approximate pass reads ONLY the index: decode x̂ per code row, score
    // with the same round-6 cosine the exact side uses
    val decoded = graft.sources.VersionedTable.read(spark, codesPath)
      .withColumn("xhat", pqDecodeExpr(cws))
      .withColumn("xn", norm(col("xhat")))
      .select(col("vec_id").as("nbr_id"), col("xhat"), col("xn"))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("nbr_id").asc)
    val shortlist = broadcast(queries)
      .join(decoded, col("query_id") =!= col("nbr_id"))
      .withColumn("approx",
        round(dot(col("qv"), col("xhat")) / (col("qn") * col("xn")), 6))
      .withColumn("srk", row_number().over(wShort))
      .filter(col("srk") <= PqShortlist)
      .select(col("query_id"), col("qv"), col("qn"), col("nbr_id"))
    // exact re-rank fetches true vectors for the SHORTLIST only
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val pqTop = shortlist
      .join(emb.select(col("vec_id").as("nbr_id"), col("v").as("nv"),
        col("nrm").as("nn")), Seq("nbr_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= AnnTopK)
      .select(col("query_id"), col("nbr_id"))
    // recall@k vs the brute-force ground truth (the q_ann_recall frame)
    val corpus = Tables.spread(emb)
      .select(col("vec_id").as("nbr_id"), col("v").as("cv"),
        col("nrm").as("cn"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val exact = broadcast(queries)
      .join(corpus, col("query_id") =!= col("nbr_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= AnnTopK)
      .select(col("query_id"), col("nbr_id"))
    val matched = exact.join(pqTop, Seq("query_id", "nbr_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_matched"))
    queries.select(col("query_id"))
      .join(matched, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)).cast("double") / AnnTopK)
          .as("recall"))
  }

  lazy val annPqSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v),
       |sub AS (
       |  SELECT vec_id, t.m AS m, list_slice(v, t.m * $PqSubDim + 1, t.m * $PqSubDim + $PqSubDim) AS sv
       |  FROM v CROSS JOIN range(0, $PqM) t(m)),
       |seeds AS (SELECT vec_id AS c, m, sv AS cw FROM sub WHERE vec_id < $PqK),
       |d1 AS (
       |  SELECT s.vec_id, s.m, sd.c,
       |    ROUND(list_sum(list_transform(range(1, $PqSubDim + 1),
       |      i -> (s.sv[i] - sd.cw[i]) * (s.sv[i] - sd.cw[i]))), 6) AS d
       |  FROM sub s JOIN seeds sd ON sd.m = s.m),
       |a1 AS (
       |  SELECT vec_id, m, c,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, c ASC) AS rn
       |  FROM d1),
       |asg1 AS (
       |  SELECT s.vec_id, s.m, a.c, s.sv
       |  FROM sub s JOIN a1 a ON a.vec_id = s.vec_id AND a.m = s.m AND a.rn = 1),
       |means AS (
       |  SELECT m, c, t.i AS i,
       |    SUM(CAST(ROUND(sv[t.i] * 1000000) AS BIGINT)) AS s, COUNT(*) AS cnt
       |  FROM asg1 CROSS JOIN range(1, $PqSubDim + 1) t(i)
       |  GROUP BY m, c, t.i),
       |cb AS (
       |  SELECT m, c, list((CAST(s AS DOUBLE) / 1000000.0) / cnt ORDER BY i) AS cw
       |  FROM means GROUP BY m, c),
       |d2 AS (
       |  SELECT s.vec_id, s.m, cb.c,
       |    ROUND(list_sum(list_transform(range(1, $PqSubDim + 1),
       |      i -> (s.sv[i] - cb.cw[i]) * (s.sv[i] - cb.cw[i]))), 6) AS d
       |  FROM sub s JOIN cb ON cb.m = s.m),
       |a2 AS (
       |  SELECT vec_id, m, c,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, c ASC) AS rn
       |  FROM d2),
       |codes AS (SELECT vec_id, m, c FROM a2 WHERE rn = 1),
       |xhat AS (
       |  SELECT codes.vec_id, flatten(list(cb.cw ORDER BY codes.m)) AS xh
       |  FROM codes JOIN cb ON cb.m = codes.m AND cb.c = codes.c
       |  GROUP BY codes.vec_id),
       |xn AS (
       |  SELECT vec_id, xh, sqrt(list_sum(list_transform(xh, x -> x * x))) AS xn
       |  FROM xhat),
       |approx AS (
       |  SELECT q.vec_id AS query_id, x.vec_id AS nbr_id, q.v AS qv, q.nrm AS qn,
       |    ROUND(list_sum(list_transform(range(1, 65),
       |      i -> q.v[i] * x.xh[i])) / (q.nrm * x.xn), 6) AS ap
       |  FROM n q JOIN xn x
       |    ON q.vec_id >= 50 AND q.vec_id < 60 AND q.vec_id <> x.vec_id),
       |short AS (
       |  SELECT query_id, nbr_id, qv, qn,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ap DESC, nbr_id ASC) AS srk
       |  FROM approx),
       |rer AS (
       |  SELECT s.query_id, s.nbr_id,
       |    ROUND(list_sum(list_transform(range(1, 65),
       |      i -> s.qv[i] * c.v[i])) / (s.qn * c.nrm), 6) AS cosine
       |  FROM short s JOIN n c ON c.vec_id = s.nbr_id
       |  WHERE s.srk <= $PqShortlist),
       |pq AS (
       |  SELECT query_id, nbr_id FROM (
       |    SELECT query_id, nbr_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rk
       |    FROM rer)
       |  WHERE rk <= $AnnTopK),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
       |    ROUND(list_sum(list_transform(range(1, 65),
       |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c ON q.vec_id >= 50 AND q.vec_id < 60 AND q.vec_id <> c.vec_id),
       |exact AS (
       |  SELECT query_id, nbr_id FROM (
       |    SELECT query_id, nbr_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rk
       |    FROM scored)
       |  WHERE rk <= $AnnTopK),
       |matched AS (
       |  SELECT e.query_id, COUNT(*) AS n_matched
       |  FROM exact e
       |  WHERE EXISTS (SELECT 1 FROM pq p
       |                WHERE p.query_id = e.query_id AND p.nbr_id = e.nbr_id)
       |  GROUP BY e.query_id)
       |SELECT q.vec_id AS query_id,
       |  COALESCE(m.n_matched, 0) AS n_matched,
       |  CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / $AnnTopK AS recall
       |FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 50 AND vec_id < 60) q
       |LEFT JOIN matched m ON m.query_id = q.vec_id""".stripMargin

  // --------------------------------------------------------------------------
  // q_ann_ivfpq — IVF + PQ COMPOSED (the FAISS-style IVFPQ): the index is
  // inverted lists of CODES — one `cells` table (vec_id, bucket, codes),
  // bucket-keyed with manifest stats, plus the two bounded driver
  // artifacts (IVF centroids, PQ codebooks). Search probes only the
  // nprobe nearest buckets (narrow argmax on the query side), ADC-scores
  // ONLY the probed cells (codes decode AFTER the bucket join — raw
  // vectors never enter the approximate pass), shortlists top-24, and
  // exact-re-ranks by fetching true vectors for the shortlist. Cost per
  // query: (corpus/K × nprobe) 8-byte code scores + |shortlist| exact
  // dots — the memory- AND compute-bounded shape 100 TB of embeddings
  // needs. Output is recall@3 vs brute force; DuckDB replays BOTH
  // trainings (IVF Lloyd + per-subspace PQ Lloyd), the probe, the ADC
  // pass, and the re-rank end to end.
  // --------------------------------------------------------------------------
  def ivfpqIndexRoot(dir: String): String =
    SkippingQueries.cachedFixturePath(dir, "ivfpq_v1", "embeddings.parquet")

  /** Build (idempotent, crash-resumable): centroids and codebooks train
    * independently; cells always derive from the STORED artifacts. */
  def buildIvfPqIndex(corpus: DataFrame, root: String): Unit = {
    import graft.sources.VersionedTable
    val spark = corpus.sparkSession
    val cent = s"$root/centroids"
    val cb = s"$root/codebooks"
    val cells = s"$root/cells"
    if (VersionedTable.latestVersion(spark, cent).isEmpty)
      VersionedTable.write(
        centroidDf(spark, kmeans(corpus, NumCentroids, iters = 1)), cent)
    if (VersionedTable.latestVersion(spark, cb).isEmpty)
      VersionedTable.write(codewordDf(spark, pqTrain(corpus)), cb)
    if (VersionedTable.latestVersion(spark, cells).isEmpty)
      VersionedTable.write(
        assignBuckets(corpus, loadCentroids(spark, cent))
          .withColumn("codes", pqCodesExpr(loadCodebooks(spark, cb)))
          .select(col("vec_id"), col("bucket"), col("codes")),
        cells, statsCols = Seq("bucket"))
  }

  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val root = ivfpqIndexRoot(dir)
    if (VersionedTable.latestVersion(spark, s"$root/cells").isEmpty) {
      val corpus = embFrame(spark, dir).cache()
      try buildIvfPqIndex(corpus, root)
      finally corpus.unpersist()
    }
    val cents = loadCentroids(spark, s"$root/centroids")
    val cws = loadCodebooks(spark, s"$root/codebooks")
    val emb = embFrame(spark, dir)
    val queries = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
    val probes = assignBuckets(queries, cents)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(slice(reverse(array_sort(col("cand"))), 1, NumProbes))
          .as("pr"))
      .withColumn("probe", -col("pr.negk"))
    // ADC pass over PROBED cells only: the bucket join restricts first,
    // the decode projects after — no raw vector is touched here
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("ap").desc, col("nbr_id").asc)
    val shortlist = broadcast(probes)
      .join(VersionedTable.read(spark, s"$root/cells")
          .select(col("vec_id").as("nbr_id"), col("bucket"), col("codes")),
        col("bucket") === col("probe") && col("nbr_id") =!= col("query_id"))
      .withColumn("xhat", pqDecodeExpr(cws))
      .withColumn("xn", norm(col("xhat")))
      .withColumn("ap",
        round(dot(col("qv"), col("xhat")) / (col("qn") * col("xn")), 6))
      .withColumn("srk", row_number().over(wShort))
      .filter(col("srk") <= PqShortlist)
      .select(col("query_id"), col("qv"), col("qn"), col("nbr_id"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val pqTop = shortlist
      .join(emb.select(col("vec_id").as("nbr_id"), col("v").as("nv"),
        col("nrm").as("nn")), Seq("nbr_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= AnnTopK)
      .select(col("query_id"), col("nbr_id"))
    val corpus = Tables.spread(emb)
      .select(col("vec_id").as("nbr_id"), col("v").as("cv"),
        col("nrm").as("cn"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val exact = broadcast(queries.select(col("vec_id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qn")))
      .join(corpus, col("query_id") =!= col("nbr_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= AnnTopK)
      .select(col("query_id"), col("nbr_id"))
    val matched = exact.join(pqTop, Seq("query_id", "nbr_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_matched"))
    queries.select(col("vec_id").as("query_id"))
      .join(matched, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)).cast("double") / AnnTopK)
          .as("recall"))
  }

  lazy val annIvfPqSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v),
       |ivseeds AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $NumCentroids),
       |ivs1 AS (
       |  SELECT n.vec_id, n.v, c.cent_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(n.v) + 1),
       |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cn), 6) AS cent_cos
       |  FROM n CROSS JOIN ivseeds c),
       |iva1 AS (
       |  SELECT vec_id, v, cent_id AS bucket,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cent_cos DESC, cent_id ASC) AS crn
       |  FROM ivs1),
       |ivasg1 AS (SELECT vec_id, v, bucket FROM iva1 WHERE crn = 1),
       |ivmeans AS (
       |  SELECT bucket, t.i AS i,
       |    SUM(CAST(ROUND(v[t.i] * 1000000) AS BIGINT)) AS s, COUNT(*) AS cnt
       |  FROM ivasg1 CROSS JOIN range(1, 65) t(i)
       |  GROUP BY bucket, t.i),
       |ivcents2 AS (
       |  SELECT bucket, list((CAST(s AS DOUBLE) / 1000000.0) / cnt ORDER BY i) AS cv
       |  FROM ivmeans GROUP BY bucket),
       |ivc2n AS (
       |  SELECT bucket, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn
       |  FROM ivcents2),
       |ivs2 AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.bucket AS cent_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(n.v) + 1),
       |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cn), 6) AS cent_cos
       |  FROM n CROSS JOIN ivc2n c),
       |iva2 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY cent_cos DESC, cent_id ASC) AS crn
       |  FROM ivs2),
       |assigned AS (
       |  SELECT vec_id AS nbr_id, cent_id AS bucket FROM iva2 WHERE crn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cent_id AS probe
       |  FROM iva2 WHERE vec_id >= 50 AND vec_id < 60 AND crn <= $NumProbes),
       |sub AS (
       |  SELECT vec_id, t.m AS m, list_slice(v, t.m * $PqSubDim + 1, t.m * $PqSubDim + $PqSubDim) AS sv
       |  FROM v CROSS JOIN range(0, $PqM) t(m)),
       |pqseeds AS (SELECT vec_id AS c, m, sv AS cw FROM sub WHERE vec_id < $PqK),
       |pqd1 AS (
       |  SELECT s.vec_id, s.m, sd.c,
       |    ROUND(list_sum(list_transform(range(1, $PqSubDim + 1),
       |      i -> (s.sv[i] - sd.cw[i]) * (s.sv[i] - sd.cw[i]))), 6) AS d
       |  FROM sub s JOIN pqseeds sd ON sd.m = s.m),
       |pqa1 AS (
       |  SELECT vec_id, m, c,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, c ASC) AS rn
       |  FROM pqd1),
       |pqasg1 AS (
       |  SELECT s.vec_id, s.m, a.c, s.sv
       |  FROM sub s JOIN pqa1 a ON a.vec_id = s.vec_id AND a.m = s.m AND a.rn = 1),
       |pqmeans AS (
       |  SELECT m, c, t.i AS i,
       |    SUM(CAST(ROUND(sv[t.i] * 1000000) AS BIGINT)) AS s, COUNT(*) AS cnt
       |  FROM pqasg1 CROSS JOIN range(1, $PqSubDim + 1) t(i)
       |  GROUP BY m, c, t.i),
       |pqcb AS (
       |  SELECT m, c, list((CAST(s AS DOUBLE) / 1000000.0) / cnt ORDER BY i) AS cw
       |  FROM pqmeans GROUP BY m, c),
       |pqd2 AS (
       |  SELECT s.vec_id, s.m, pqcb.c,
       |    ROUND(list_sum(list_transform(range(1, $PqSubDim + 1),
       |      i -> (s.sv[i] - pqcb.cw[i]) * (s.sv[i] - pqcb.cw[i]))), 6) AS d
       |  FROM sub s JOIN pqcb ON pqcb.m = s.m),
       |pqa2 AS (
       |  SELECT vec_id, m, c,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, c ASC) AS rn
       |  FROM pqd2),
       |codes AS (SELECT vec_id, m, c FROM pqa2 WHERE rn = 1),
       |xhat AS (
       |  SELECT codes.vec_id, flatten(list(pqcb.cw ORDER BY codes.m)) AS xh
       |  FROM codes JOIN pqcb ON pqcb.m = codes.m AND pqcb.c = codes.c
       |  GROUP BY codes.vec_id),
       |xn AS (
       |  SELECT vec_id, xh, sqrt(list_sum(list_transform(xh, x -> x * x))) AS xn
       |  FROM xhat),
       |cand AS (
       |  SELECT p.query_id, a.nbr_id, p.qv, p.qn,
       |    ROUND(list_sum(list_transform(range(1, 65),
       |      i -> p.qv[i] * x.xh[i])) / (p.qn * x.xn), 6) AS ap
       |  FROM probes p
       |  JOIN assigned a ON a.bucket = p.probe AND a.nbr_id <> p.query_id
       |  JOIN xn x ON x.vec_id = a.nbr_id),
       |short AS (
       |  SELECT query_id, nbr_id, qv, qn,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ap DESC, nbr_id ASC) AS srk
       |  FROM cand),
       |rer AS (
       |  SELECT s.query_id, s.nbr_id,
       |    ROUND(list_sum(list_transform(range(1, 65),
       |      i -> s.qv[i] * c.v[i])) / (s.qn * c.nrm), 6) AS cosine
       |  FROM short s JOIN n c ON c.vec_id = s.nbr_id
       |  WHERE s.srk <= $PqShortlist),
       |pq AS (
       |  SELECT query_id, nbr_id FROM (
       |    SELECT query_id, nbr_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rk
       |    FROM rer)
       |  WHERE rk <= $AnnTopK),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
       |    ROUND(list_sum(list_transform(range(1, 65),
       |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c ON q.vec_id >= 50 AND q.vec_id < 60 AND q.vec_id <> c.vec_id),
       |exact AS (
       |  SELECT query_id, nbr_id FROM (
       |    SELECT query_id, nbr_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rk
       |    FROM scored)
       |  WHERE rk <= $AnnTopK),
       |matched AS (
       |  SELECT e.query_id, COUNT(*) AS n_matched
       |  FROM exact e
       |  WHERE EXISTS (SELECT 1 FROM pq p
       |                WHERE p.query_id = e.query_id AND p.nbr_id = e.nbr_id)
       |  GROUP BY e.query_id)
       |SELECT q.vec_id AS query_id,
       |  COALESCE(m.n_matched, 0) AS n_matched,
       |  CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / $AnnTopK AS recall
       |FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 50 AND vec_id < 60) q
       |LEFT JOIN matched m ON m.query_id = q.vec_id""".stripMargin

  // --------------------------------------------------------------------------
  // q_hard_negatives — hard-negative mining for contrastive training
  // (in-batch negatives are mostly easy; the negatives that move a model
  // are the most-similar DIFFERENT-label examples). Search is LSH-bucketed
  // (same hyperplane index as q_ann_lsh): an anchor only scores its own
  // bucket — corpus/2^planes of the data — then filters to label
  // mismatches and keeps the top-k by cosine. The label predicate rides
  // INSIDE the bucket join (filters before the window), so the candidate
  // set stays sublinear at any corpus size; the anchor side is bounded and
  // the corpus never shuffles beyond the bucket hash.
  // --------------------------------------------------------------------------
  val HardNegTopK = 3

  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread: A/B-measured neutral (see annLsh)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("bucket", bucketExpr(col("v")))
    val anchors = emb.filter(col("vec_id") >= 200 && col("vec_id") < 220)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
        col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val corpus = emb.select(col("vec_id").as("nbr_id"),
      col("label").as("n_label"), col("v").as("nv"), col("nrm").as("nn"),
      col("bucket"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    anchors.join(corpus, Seq("bucket"))
      .filter(col("nbr_id") =!= col("anchor_id") &&
        col("n_label") =!= col("a_label"))
      .withColumn("cosine",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= HardNegTopK)
      .select(col("anchor_id"), col("rk"), col("nbr_id"),
        col("a_label"), col("n_label"), col("cosine"))
  }

  lazy val hardNegativesSql: String = {
    def lit64(a: Array[Double]): String = a.mkString("[", ", ", "]")
    val bucketTerms = (0 until NumPlanes).map { p =>
      s"""(CASE WHEN list_sum(list_transform(range(1, LEN(v) + 1),
         |  i -> (${lit64(planes(p))})[i] * v[i])) >= 0.0 THEN ${1 << p} ELSE 0 END)"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(" + ")
    s"""WITH v AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, label, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
       |    $bucketTerms AS bucket
       |  FROM v),
       |cand AS (
       |  SELECT q.vec_id AS anchor_id, c.vec_id AS nbr_id,
       |    q.label AS a_label, c.label AS n_label,
       |    ROUND(list_sum(list_transform(range(1, LEN(q.v) + 1),
       |      i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c
       |    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |      AND q.label <> c.label
       |  WHERE q.vec_id >= 200 AND q.vec_id < 220)
       |SELECT anchor_id,
       |  ROW_NUMBER() OVER (PARTITION BY anchor_id
       |    ORDER BY cosine DESC, nbr_id ASC) AS rk,
       |  nbr_id, a_label, n_label, cosine
       |FROM cand
       |QUALIFY rk <= $HardNegTopK""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_semantic_dedup — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  // semantic near-duplicate pruning over embeddings. Cluster the corpus with
  // k-means, then compare pairs ONLY within a cluster — the candidate set is
  // Σ|cluster|², never N², which is the whole trick: at 100 TB you scale K
  // with N (K ≈ N/targetClusterSize) so per-cluster pair counts stay
  // bounded, and the only shuffle is the hash partition on `bucket` (skewed
  // mega-clusters split under AQE skew-join handling). Keep rule per the
  // paper: within each cluster, order members by cosine-to-centroid
  // ASCENDING (farthest-from-centroid kept preferentially — they carry the
  // most diversity) and mark a member duplicate iff some EARLIER-ranked
  // member is within CosineThreshold. Index build reuses the IVF k-means
  // (driver-bounded K×dim centroids, one Lloyd iteration to match the
  // oracle's SQL replica).
  // --------------------------------------------------------------------------
  // ε tuned so the synthetic corpus exercises BOTH branches at the gate
  // scales (max within-cluster pair cosine there is ~0.47; real corpora run
  // 0.9+ — the knob, not the mechanism)
  val SemDedupThreshold: Double = 0.4

  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticDedup(spark, dir, NumCentroids)

  def semanticDedup(spark: SparkSession, dir: String, k: Int): DataFrame = {
    // cache lifetime contract: the returned (lazy) frame references this
    // cache, so it cannot unpersist here — every harness (Bench, Verify)
    // clearCache()s after the result materializes; ad-hoc callers should too
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .cache()
    val cents = kmeans(emb, k, iters = 1)
    // narrow argmax assignment (PlanAuditSpec-audited for q_ann_ivf); the
    // winning struct also carries the cosine-to-centroid, so cent_cos is a
    // free projection off the same candidate array
    val ranked = assignBuckets(emb, cents)
      .withColumn("cent_cos", array_max(col("cand")).getField("cos"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("bucket"))
        .orderBy(col("cent_cos").asc, col("vec_id").asc)))
      .select(col("vec_id"), col("bucket"), col("rnk"), col("cent_cos"),
        col("v"), col("nrm"))
    val prior = ranked.select(col("bucket").as("jb"), col("rnk").as("jr"),
      col("v").as("jv"), col("nrm").as("jn"))
    // within-bucket triangular pairs (j strictly earlier-ranked): one
    // hash-partitioned self-join on bucket, then a per-member max — the
    // greedy "closest prior neighbor" screen as one aggregation
    val priorMax = ranked.join(prior,
        col("bucket") === col("jb") && col("jr") < col("rnk"))
      .withColumn("pc",
        round(dot(col("v"), col("jv")) / (col("nrm") * col("jn")), 6))
      .groupBy(col("vec_id")).agg(max(col("pc")).as("prior_cos"))
    ranked.join(priorMax, Seq("vec_id"), "left")
      .withColumn("is_dup",
        coalesce(col("prior_cos") > lit(SemDedupThreshold), lit(false)))
      .select(col("vec_id"), col("bucket"), col("rnk"), col("cent_cos"),
        col("prior_cos"), col("is_dup"))
  }

  /** Same k-means replica as [[annIvfSql]] (seed = first K vectors, one
    * micros-quantized Lloyd step), then the within-cluster triangular
    * screen. */
  val semanticDedupSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v),
       |seeds AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $NumCentroids),
       |s1 AS (
       |  SELECT n.vec_id, n.v, c.cent_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(n.v) + 1),
       |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cn), 6) AS cent_cos
       |  FROM n CROSS JOIN seeds c),
       |a1 AS (
       |  SELECT vec_id, v, cent_id AS bucket,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cent_cos DESC, cent_id ASC) AS crn
       |  FROM s1),
       |asg1 AS (SELECT vec_id, v, bucket FROM a1 WHERE crn = 1),
       |means AS (
       |  SELECT bucket, t.i AS i,
       |    SUM(CAST(ROUND(v[t.i] * 1000000) AS BIGINT)) AS s, COUNT(*) AS cnt
       |  FROM asg1 CROSS JOIN range(1, 65) t(i)
       |  GROUP BY bucket, t.i),
       |cents2 AS (
       |  SELECT bucket, list((CAST(s AS DOUBLE) / 1000000.0) / cnt ORDER BY i) AS cv
       |  FROM means GROUP BY bucket),
       |c2n AS (
       |  SELECT bucket, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn
       |  FROM cents2),
       |s2 AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.bucket AS cent_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(n.v) + 1),
       |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cn), 6) AS cent_cos
       |  FROM n CROSS JOIN c2n c),
       |a2 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY cent_cos DESC, cent_id ASC) AS crn
       |  FROM s2),
       |ranked AS (
       |  SELECT vec_id, cent_id AS bucket, cent_cos, v, nrm,
       |    ROW_NUMBER() OVER (PARTITION BY cent_id
       |      ORDER BY cent_cos ASC, vec_id ASC) AS rnk
       |  FROM a2 WHERE crn = 1),
       |priormax AS (
       |  SELECT i.vec_id,
       |    MAX(ROUND(list_sum(list_transform(range(1, 65),
       |      t -> i.v[t] * j.v[t])) / (i.nrm * j.nrm), 6)) AS prior_cos
       |  FROM ranked i JOIN ranked j
       |    ON i.bucket = j.bucket AND j.rnk < i.rnk
       |  GROUP BY i.vec_id)
       |SELECT r.vec_id, r.bucket, r.rnk, r.cent_cos, m.prior_cos,
       |  COALESCE(m.prior_cos > $SemDedupThreshold, FALSE) AS is_dup
       |FROM ranked r LEFT JOIN priormax m ON m.vec_id = r.vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk"    -> (cosineTopK _),
    "q_ann_ivf"        -> (annIvf _),
    "q_ann_lsh"        -> (annLsh _),
    "q_ann_recall"     -> (annRecall _),
    "q_ann_incremental" -> (annIncremental _),
    "q_ann_pq"         -> (annPq _),
    "q_ann_ivfpq"      -> (annIvfPq _),
    "q_semantic_dedup" -> ((s: SparkSession, d: String) => semanticDedup(s, d)),
    "q_hard_negatives" -> (hardNegatives _),
  )

  val oracles: Map[String, String] = Map(
    "q_cosine_topk"    -> cosineTopKSql,
    "q_ann_ivf"        -> annIvfSql,
    "q_ann_lsh"        -> annLshSql,
    "q_ann_recall"     -> annRecallSql,
    "q_ann_incremental" -> annIncrementalSql,
    "q_ann_pq"         -> annPqSql,
    "q_ann_ivfpq"      -> annIvfPqSql,
    "q_semantic_dedup" -> semanticDedupSql,
    "q_hard_negatives" -> hardNegativesSql,
  )
}
