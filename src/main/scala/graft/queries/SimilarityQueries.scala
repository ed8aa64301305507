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
    val corpus = emb.repartition(spark.sparkContext.defaultParallelism)
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
  // q_ann_ivf — IVF-bucketed ANN: the 100 TB scale path. Vectors are
  // assigned to their nearest of K "centroid" vectors (deterministically the
  // first K corpus vectors — a stand-in for k-means, which would train the
  // same assignment structure); a query probes only its nprobe nearest
  // buckets, so search cost is |queries| × (corpus/K × nprobe) instead of
  // |queries| × corpus. Exact cosine re-ranking inside the probed buckets.
  // --------------------------------------------------------------------------
  val NumCentroids = 8
  val NumProbes = 2
  val AnnTopK = 3

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val cents = emb.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))

    val wCent = Window.partitionBy(col("vec_id"))
      .orderBy(col("cent_cos").desc, col("cent_id").asc)
    val scored = emb.join(broadcast(cents))
      .withColumn("cent_cos", round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6))
      .withColumn("crn", row_number().over(wCent))

    val assigned = scored.filter(col("crn") === 1)
      .select(col("vec_id").as("nbr_id"), col("v").as("nv"), col("nrm").as("nn"),
        col("cent_id").as("bucket"))
    val probes = scored
      .filter(col("vec_id") >= 50 && col("vec_id") < 60 && col("crn") <= NumProbes)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("cent_id").as("probe"))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    probes.join(assigned,
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
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $NumCentroids),
       |scored AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
       |    ROUND(list_sum(list_transform(range(1, LEN(n.v) + 1),
       |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cn), 6) AS cent_cos
       |  FROM n CROSS JOIN cents c),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY cent_cos DESC, cent_id ASC) AS crn
       |  FROM scored),
       |assigned AS (
       |  SELECT vec_id AS nbr_id, v AS nv, nrm AS nn, cent_id AS bucket
       |  FROM ranked WHERE crn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cent_id AS probe
       |  FROM ranked WHERE vec_id >= 50 AND vec_id < 60 AND crn <= $NumProbes),
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> (cosineTopK _),
    "q_ann_ivf"     -> (annIvf _),
    "q_ann_lsh"     -> (annLsh _),
  )

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" -> cosineTopKSql,
    "q_ann_ivf"     -> annIvfSql,
    "q_ann_lsh"     -> annLshSql,
  )
}
