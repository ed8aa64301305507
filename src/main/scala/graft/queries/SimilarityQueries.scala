package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val corpus = emb
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> (cosineTopK _),
  )

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" -> cosineTopKSql,
  )
}
