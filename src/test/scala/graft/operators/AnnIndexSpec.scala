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

  /** Deterministic synthetic 64-dim corpus for the PQ tests (PQ splits
    * into [[SimilarityQueries.PqM]] subspaces of
    * [[SimilarityQueries.PqSubDim]] dims). */
  private def vecs64(ids: Seq[Int]): DataFrame = {
    import graft.functions.VectorFunctions.norm
    ids.map(id => (id.toLong,
        Seq.tabulate(64)(d => ((id * 31 + d * 17) % 97 + 1).toDouble / 97.0)))
      .toDF("vec_id", "v")
      .withColumn("nrm", norm(col("v")))
  }

  test("PQ index is a bounded artifact: codes ≪ raw vectors, deterministic, resume is a no-op") {
    import SimilarityQueries.{PqM, PqSubDim, PqK}
    val root = tmp()
    val (cb, codes) = (s"$root/codebooks", s"$root/codes")
    val corpus = vecs64(0 until 300).cache()
    try {
      val (cv, xv) = SimilarityQueries.buildPqIndex(corpus, cb, codes)
      assert(cv == 1L && xv == 1L)
      // re-entrant build is a no-op (crash-resume contract)
      assert(SimilarityQueries.buildPqIndex(corpus, cb, codes) == ((1L, 1L)))
      // the INDEX is bounded: M codes per vector + an M×K×subDim codebook
      // vs 64 doubles per vector raw — cells ratio well under 1/4
      val cwRows = VersionedTable.read(spark, cb).collect()
      assert(cwRows.length <= PqM * PqK)
      assert(cwRows.forall(
        _.getAs[scala.collection.Seq[Double]]("cw").length == PqSubDim))
      val codeRows = VersionedTable.read(spark, codes).collect()
      assert(codeRows.length == 300)
      assert(codeRows.forall(
        _.getAs[scala.collection.Seq[Int]]("codes").length == PqM))
      val indexCells = codeRows.length * PqM + cwRows.length * PqSubDim
      val rawCells = codeRows.length * 64
      assert(indexCells.toDouble / rawCells < 0.25,
        s"index $indexCells cells vs raw $rawCells")
      // deterministic train: a rebuild lands byte-identical codebooks
      val again = SimilarityQueries.pqTrain(corpus)
      val stored = SimilarityQueries.loadCodebooks(spark, cb)
      assert(again.map(c => (c.m, c.c, c.v.toSeq)) ==
        stored.map(c => (c.m, c.c, c.v.toSeq)))
      // every code refers to a live codeword, and the decode expression
      // reconstructs exactly the concatenation of the row's codewords
      val cwOf = stored.map(c => (c.m, c.c) -> c.v.toSeq).toMap
      val decoded = VersionedTable.read(spark, codes)
        .withColumn("xhat", SimilarityQueries.pqDecodeExpr(stored))
        .collect()
      decoded.foreach { r =>
        val cs = r.getAs[scala.collection.Seq[Int]]("codes")
        val expect = (0 until PqM).flatMap(m => cwOf((m, cs(m))))
        assert(r.getAs[scala.collection.Seq[Double]]("xhat") == expect)
      }
    } finally corpus.unpersist()
  }

  test("composed IVFPQ index: cells hold codes not vectors; resume is a no-op") {
    import SimilarityQueries.{PqM, NumCentroids}
    val root = tmp()
    val corpus = vecs64(0 until 300).cache()
    try {
      SimilarityQueries.buildIvfPqIndex(corpus, root)
      // the inverted lists carry ONLY (vec_id, bucket, codes) — no raw
      // vector column anywhere in the probe-side index
      val cells = VersionedTable.read(spark, s"$root/cells")
      assert(cells.columns.toSet == Set("vec_id", "bucket", "codes"),
        cells.columns.mkString(","))
      assert(cells.count() == 300)
      val centIds = SimilarityQueries
        .loadCentroids(spark, s"$root/centroids").map(_.id).toSet
      assert(centIds.size <= NumCentroids)
      val rows = cells.collect()
      assert(rows.forall(r => centIds.contains(
        r.getAs[Number]("bucket").intValue)))
      assert(rows.forall(
        _.getAs[scala.collection.Seq[Int]]("codes").length == PqM))
      // crash-resume: a rebuild call writes nothing new
      val versions = Seq("centroids", "codebooks", "cells").map(t =>
        VersionedTable.latestVersion(spark, s"$root/$t"))
      SimilarityQueries.buildIvfPqIndex(corpus, root)
      assert(Seq("centroids", "codebooks", "cells").map(t =>
        VersionedTable.latestVersion(spark, s"$root/$t")) == versions)
    } finally corpus.unpersist()
  }
}
