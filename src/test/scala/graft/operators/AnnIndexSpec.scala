package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.SimilarityQueries
import graft.sources.VersionedTable

/** The persisted-IVF-index incremental contract: build commits the
  * centroids exactly once; probes and batch appends NEVER bump the
  * centroids version (the corpus is not re-clustered per batch); only the
  * explicit recluster maintenance verb does.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("annidx").toString

  /** Deterministic synthetic (vec_id, v double[8], nrm) frame. The id
    * period (101) exceeds every id used below, so no two distinct ids
    * share a vector — a cosine of exactly 1.0 identifies one vector. */
  private def vecs(ids: Seq[Int]): DataFrame = {
    import graft.functions.VectorFunctions.norm
    ids.map(id => (id.toLong,
        Seq.tabulate(8)(d => ((id * 13 + d * 7) % 101 + 1).toDouble)))
      .toDF("vec_id", "v")
      .withColumn("nrm", norm(col("v")))
  }

  test("build commits once; probing the index never writes or re-clusters") {
    val root = tmp()
    val (cent, asg) = (s"$root/centroids", s"$root/assignments")
    val corpus = vecs(1 to 40).cache()
    val (cv, av) = SimilarityQueries.buildAnnIndex(
      corpus, col("vec_id") <= 4, cent, asg)
    assert(cv == 1L && av == 1L)
    // re-entrant build is a no-op (crash-resume contract)
    assert(SimilarityQueries.buildAnnIndex(
      corpus, col("vec_id") <= 4, cent, asg) == (1L, 1L))
    corpus.unpersist()
    val queries = vecs(Seq(100, 110))
    val r1 = SimilarityQueries.annIndexProbe(queries, cent, asg, 2, 3).collect()
    val r2 = SimilarityQueries.annIndexProbe(queries, cent, asg, 2, 3).collect()
    assert(r1.nonEmpty && r1.map(_.toString).sorted.sameElements(
      r2.map(_.toString).sorted))
    // the probe path performed zero commits on either table
    assert(VersionedTable.latestVersion(spark, cent).contains(1L))
    assert(VersionedTable.latestVersion(spark, asg).contains(1L))
  }

  test("append folds a batch in with the STORED centroids; centroids version stays") {
    val root = tmp()
    val (cent, asg) = (s"$root/centroids", s"$root/assignments")
    SimilarityQueries.buildAnnIndex(vecs(1 to 40), col("vec_id") <= 4, cent, asg)
    // batch 1: ids 101..110 — appended, NOT re-clustered
    val v1 = SimilarityQueries.annIndexAppend(spark, vecs(101 to 110), cent, asg)
    assert(v1 == 2L)
    assert(VersionedTable.latestVersion(spark, cent).contains(1L),
      "append must not touch the centroids table")
    // appended vectors are searchable: probe with an appended vector's
    // exact coordinates under a fresh id and expect that appended id back
    // at cosine 1.0 (the fresh id also exercises the self-guard).
    val probe = vecs(Seq(101)).withColumn("vec_id", lit(201L))
    val hits = SimilarityQueries.annIndexProbe(probe, cent, asg, 2, 3).collect()
    assert(hits.exists(r => r.getAs[Long]("nbr_id") == 101L &&
      r.getAs[Double]("cosine") == 1.0), hits.mkString("; "))
    // a second append keeps accumulating without re-clustering
    assert(SimilarityQueries.annIndexAppend(spark, vecs(111 to 115), cent, asg) == 3L)
    assert(VersionedTable.latestVersion(spark, cent).contains(1L))
  }

  test("recluster is the only writer of centroids; assignments survive complete") {
    val root = tmp()
    val (cent, asg) = (s"$root/centroids", s"$root/assignments")
    SimilarityQueries.buildAnnIndex(vecs(1 to 40), col("vec_id") <= 4, cent, asg)
    SimilarityQueries.annIndexAppend(spark, vecs(101 to 120), cent, asg)
    val before = VersionedTable.read(spark, asg).count()
    val (cv, av) = SimilarityQueries.annIndexRecluster(spark, cent, asg)
    assert(cv == 2L && av >= 3L)
    val after = VersionedTable.read(spark, asg)
    assert(after.count() == before, "recluster must re-assign every vector")
    // buckets reference live centroid ids after the rewrite
    val centIds = SimilarityQueries.loadCentroids(spark, cent).map(_.id).toSet
    val usedBuckets = after.select(col("bucket")).distinct()
      .collect().map(_.getAs[Number]("bucket").intValue).toSet
    assert(usedBuckets.subsetOf(centIds))
  }
}
