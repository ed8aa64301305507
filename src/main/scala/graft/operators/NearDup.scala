package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Near-duplicate detection over the `documents` table — the dedup family a
  * training-data pipeline needs (exact dedup lives in TextQueries):
  *
  *  - n-gram Jaccard (exact, inverted-index join — the ground truth)
  *  - MinHash + LSH banding (the 100 TB scale path: candidate generation
  *    touches only per-band hash buckets, never all pairs)
  *  - SimHash (bitwise fingerprint; vote vector → sign bits)
  *
  * Determinism: every hash is md5 (identical in Spark and DuckDB), and
  * minhash signatures are lexicographic MINs of fixed-length hex strings —
  * equivalent to numeric minhash but reproducible in ANSI SQL, so the
  * DuckDB oracle replicates the algorithm exactly rather than approximating.
  *
  * Scale notes: shingling is a narrow explode; signatures/bands are one
  * hash-aggregate each; the LSH self-join shuffles on (band, key) whose
  * cardinality is O(#docs × #bands), not O(#docs²). The exact-Jaccard
  * verify only runs over LSH candidates. At 100 TB the all-pairs variant
  * (ngramJaccardPairs) is the one you would NOT run — it exists as the
  * correctness oracle for the approximate path.
  */
object NearDup {

  val ShingleSize = 3
  val NumHashes = 12
  val BandRows = 3
  val NumBands: Int = NumHashes / BandRows
  val JaccardThreshold = 0.5

  /** Distinct word n-gram shingles per document (docs shorter than one
    * shingle drop out — they can't near-dup by n-gram overlap).
    *
    * The input is re-spread across all cores first: a single-row-group
    * parquet file arrives as ONE partition, which would serialize the whole
    * explode+hash chain onto one task (observed: 31/32 threads idle).
    * Repartitioning a few MB of text is noise next to that.
    *
    * The spread is KEYED by doc_id: the `.distinct()` below groups on
    * (doc_id, shingle) and every consumer aggregate (signatures, per-doc
    * sizes) groups on doc_id, so hash(doc_id) partitioning satisfies all of
    * their distributions — one exchange where the old round-robin spread
    * paid three (spread + distinct + signature agg). */
  def shingles(docs: DataFrame): DataFrame =
    Tables.spread(docs, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= ShingleSize)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ws) - $ShingleSize), i -> concat_ws(' ', slice(ws, i + 1, $ShingleSize)))"))
        .as("shingle"))
      .distinct()

  /** MinHash signature: NumHashes independent hash functions simulated by
    * salting the shingle before md5; per-function minimum over the doc's
    * shingle set. One hash-aggregate.
    *
    * r19: the per-row work is [[graft.functions.SaltedMd5Bin]] — a codegen
    * thread-local digest returning 16 BYTES — and the min runs on
    * BinaryType (unsigned lexicographic == hex order for equal-length
    * arrays), with the hex string produced once per GROUP. Values are
    * bit-identical to `min(md5(concat(shingle, '#i')))` (NearDupSpec pins
    * the identity); the per-row concat, per-call MessageDigest and 32-char
    * hex allocation are gone from the hot aggregate. */
  def signatures(sh: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(i =>
      lower(hex(min(graft.functions.SaltedMd5Bin(col("shingle"), s"#$i"))))
        .as(s"mh$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: NumBands keys per doc; docs sharing any band key become
    * candidate pairs. */
  def bandKeys(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until BandRows).map(r => col(s"mh${b * BandRows + r}")): _*)).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Attach exact Jaccard to per-pair intersection counts; integer set sizes
    * make the final division bit-exact across engines.
    *
    * No explicit broadcast hints here: hinting a DERIVED subplan forces a
    * separate broadcast job that recomputes the whole upstream chain
    * (observed as repeated 5s signature stages), while AQE converts these
    * joins to broadcast at runtime from the already-materialized shuffle
    * outputs — same network shape, zero recompute. */
  private def jaccardFromInter(inter: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact Jaccard over given (small) candidate pair set: the candidate list
    * prunes the shingle table before the wide intersection join (AQE
    * broadcasts the small side at runtime without recompute). */
  def verifyJaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    val inter = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(cand, Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    jaccardFromInter(inter, sh)
  }

  /** Shingles marked for caching but NOT eagerly primed. The shingle set
    * fans out to 4-5 consumer subtrees which AQE submits CONCURRENTLY — a
    * cold cache at fan-out time means they all miss and recompute the chain
    * in parallel (observed 5× redundant work). Every caller therefore
    * materializes a SINGLE-subtree consumer first — [[cachedBands]]'s
    * priming count or the hot-shingle probe — which fills this cache as a
    * side effect with no concurrency hazard; a separate sh.count() priming
    * job (the r15 design) re-read the whole chain for nothing. */
  private def lazyCachedShingles(docs: DataFrame): DataFrame =
    shingles(docs).cache()

  /** Band-key frame cached + primed BEFORE the LSH self-join: both join
    * inputs of [[lshCandidates]] are the SAME `bandKeys(signatures(sh))`
    * subtree, and the shingle cache underneath does not stop each side
    * from re-running the 12-way min-md5 signature aggregate and band
    * explosion independently (observed: the aggregate — the whole cost of
    * the sketch — executed twice per query). Materializing the band frame
    * once makes the self-join read a few-MB cache twice instead. */
  private def cachedBands(sh: DataFrame): DataFrame = {
    val bands = bandKeys(signatures(sh)).cache()
    bands.count()
    bands
  }

  // --------------------------------------------------------------------------
  // q_minhash_lsh — MinHash+LSH candidates, exact-Jaccard verified.
  // --------------------------------------------------------------------------
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // sh cache fills during cachedBands' priming count (signatures is one
    // single-subtree aggregate over it) — no separate priming job needed
    val sh = lazyCachedShingles(Tables.documents(spark, dir))
    verifyJaccard(lshCandidates(cachedBands(sh)), sh)
  }

  // --------------------------------------------------------------------------
  // q_ngram_jaccard — exact n-gram Jaccard via inverted-index self-join with
  // a document-frequency cap. A shingle appearing in k docs contributes k²
  // self-join rows, so one stop-phrase shingle in 1% of a 100 TB corpus
  // would dominate the whole query (the hot-shingle problem). Structure
  // (the prefix/hot-token split from the similarity-join literature, cf.
  // PPJoin): the self-join — candidate generation AND the bulk of the
  // intersection counts — runs only over shingles with df <= MaxShingleDf;
  // the few HOT shingles (df > cap) are then added back EXACTLY with a
  // bounded candidates×hot-postings join, so the Jaccard of every surviving
  // pair is exact, not approximate. A qualifying pair is lost only if ALL
  // its shared shingles are hot; NearDupSpec asserts capped == uncapped
  // output on the test corpus (max df observed at sf0.1 is 25, so the cap
  // of 64 is a no-op there by a 2.5× margin, and the hot side is empty).
  // --------------------------------------------------------------------------
  val MaxShingleDf = 64

  /** Exact Jaccard pairs with the df-capped self-join + hot-shingle
    * correction; `maxDf = Int.MaxValue` degenerates to the pure one-pass
    * all-pairs join (the spec's uncapped reference). Expects `sh` marked
    * for caching: the hot-shingle probe doubles as the cache-priming job.
    *
    * Adaptive plan choice: when NO shingle is hot (the healthy-corpus
    * common case, and all test SFs) the capped plan is value-identical to
    * the direct one-pass self-join, so we run exactly that — zero runtime
    * overhead for the protection. The anti-join + correction subtrees only
    * enter the plan when a hot shingle actually exists. */
  private[operators] def ngramJaccardFrom(sh: DataFrame, maxDf: Int): DataFrame = {
    def interFrom(side: DataFrame): DataFrame =
      side.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(side.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter_r"))
    val hot = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("shingle"))
    // one job: primes the shingle cache (full pass) AND detects hot shingles
    val anyHot = maxDf != Int.MaxValue && hot.count() > 0
    val inter = if (!anyHot) {
      interFrom(sh).withColumnRenamed("inter_r", "inter")
    } else {
      val shRare = sh.join(hot, Seq("shingle"), "left_anti")
      // capped self-join: candidate pairs and their rare-shingle
      // intersection counts in one pass (identical subtrees reuse the
      // aggregate's shuffle output via ReuseExchange)
      val interRare = interFrom(shRare)
      // exact correction: shared HOT shingles of surviving candidates
      // (bounded: |candidates| × hot postings per doc)
      val shHot = sh.join(hot, Seq("shingle"))
      val interHot = interRare.select(col("doc_a"), col("doc_b"))
        .join(shHot.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
        .join(shHot.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter_h"))
      interRare.join(interHot, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"),
          (col("inter_r") + coalesce(col("inter_h"), lit(0L))).as("inter"))
    }
    jaccardFromInter(inter, sh)
  }

  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    // cache primed by ngramJaccardFrom's hot-shingle probe, not a count()
    val sh = shingles(Tables.documents(spark, dir)).cache()
    ngramJaccardFrom(sh, MaxShingleDf)
  }

  // Shared oracle CTE prefix: shingles exactly as `shingles` builds them.
  private val shinglesCte: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |  WHERE LEN(string_split(text, ' ')) >= $ShingleSize),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(generate_series(1, LEN(ws) - ${ShingleSize - 1}),
       |      i -> array_to_string(ws[i:i+${ShingleSize - 1}], ' '))) AS shingle
       |  FROM w),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  /** Per-hash signature expression — the ONE place the minhash protocol is
    * spelled in SQL (every oracle builder composes it). */
  private def mhExpr(i: Int): String = s"MIN(md5(shingle || '#$i'))"

  /** sig + bands CTEs (expect `sh (doc_id, shingle)` in scope): signatures
    * then LSH band keys, shared verbatim by every banding oracle. */
  private def sigBandsCte: String = {
    val mhCols = (0 until NumHashes)
      .map(i => s"${mhExpr(i)} AS mh$i").mkString(", ")
    val bandSelects = (0 until NumBands).map { b =>
      val parts = (0 until BandRows).map(r => s"mh${b * BandRows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $parts)) AS key FROM sig"
    }.mkString(" UNION ALL ")
    s"""sig AS (SELECT doc_id, $mhCols FROM sh GROUP BY doc_id),
       |bands AS ($bandSelects)""".stripMargin
  }

  /** The symmetric LSH candidate CTE (a < b de-dupes the pair). */
  private val lshCandCte: String =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin

  /** Exact-Jaccard verification CTEs over a `cand (doc_a, doc_b)` CTE:
    * `ver` holds the >= threshold survivors with their jaccard — the one
    * SQL spelling of the verify formula, shared by every consumer. */
  private def jaccardVerifyCtes(candCte: String): String =
    s"""$candCte,
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY c.doc_a, c.doc_b),
       |ver AS (
       |  SELECT i.doc_a, i.doc_b,
       |    CAST(i.inter AS DOUBLE) / (na.n + nb.n - i.inter) AS jaccard
       |  FROM inter i
       |  JOIN sizes na ON na.doc_id = i.doc_a
       |  JOIN sizes nb ON nb.doc_id = i.doc_b
       |  WHERE CAST(i.inter AS DOUBLE) / (na.n + nb.n - i.inter)
       |    >= $JaccardThreshold)""".stripMargin

  private def jaccardTail(candCte: String): String =
    jaccardVerifyCtes(candCte) + "\nSELECT doc_a, doc_b, jaccard FROM ver"

  val minhashLshSql: String =
    shinglesCte + ",\n" + sigBandsCte + ",\n" + jaccardTail(lshCandCte)

  // --------------------------------------------------------------------------
  // q_minhash_estimate — Jaccard ESTIMATED from signature agreement
  // (matching minhash components / NumHashes), the sketch's actual role at
  // 100 TB: candidate pairs get a similarity score from 12 column equality
  // checks on already-computed signatures, skipping the shingle-intersection
  // verify join entirely. The exact-verify path (q_minhash_lsh) remains the
  // precision option; this is the cheap screening pass between banding and
  // verification.
  // --------------------------------------------------------------------------
  def minhashEstimate(spark: SparkSession, dir: String): DataFrame = {
    // shingles feed exactly ONE consumer here (the signature aggregate), so
    // neither a shingle cache nor a priming job buys anything — the whole
    // query runs off the signature cache below
    val sh = shingles(Tables.documents(spark, dir))
    // the signature table feeds three subtrees (banding + both join sides);
    // eager cache for the usual AQE-concurrent-subtree reason
    val sig = signatures(sh).cache()
    sig.count()
    val cand = lshCandidates(bandKeys(sig))
    val sigA = sig.select(col("doc_id").as("doc_a") +:
      (0 until NumHashes).map(i => col(s"mh$i").as(s"a$i")): _*)
    val sigB = sig.select(col("doc_id").as("doc_b") +:
      (0 until NumHashes).map(i => col(s"mh$i").as(s"b$i")): _*)
    val matches = (0 until NumHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sigA, Seq("doc_a")).join(sigB, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (matches.cast(DoubleType) / NumHashes).as("est_jaccard"))
  }

  val minhashEstimateSql: String = {
    val matches = (0 until NumHashes)
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
    shinglesCte + ",\n" + sigBandsCte + ",\n" +
      s"""$lshCandCte
         |SELECT c.doc_a, c.doc_b,
         |  CAST($matches AS DOUBLE) / $NumHashes AS est_jaccard
         |FROM cand c
         |JOIN sig a ON a.doc_id = c.doc_a
         |JOIN sig b ON b.doc_id = c.doc_b""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_dedup_clusters — the dedup pipeline's last step: single-linkage
  // connected components over the LSH-verified near-dup pair graph, electing
  // min(doc_id) per component as the canonical survivor. Two tiers by the
  // (already counted) edge total: a driver-sized graph solves in ONE
  // union-find pass and broadcasts its label map ([[connectedLabels]]);
  // above [[MaxDriverEdges]], Pregel-style min-label propagation — each
  // round one edges⋈labels hash join + min-agg, iterated to fixpoint with
  // a driver-side convergence count. Rounds = eccentricity of the
  // component's min node; near-dup components are tiny by construction
  // (LSH + Jaccard threshold), so this converges in 1-3 rounds at any
  // corpus size — the iteration count scales with cluster DIAMETER, not
  // corpus size. Labels are re-cached per round and the pair graph
  // (orders smaller than the corpus) is cached once.
  // --------------------------------------------------------------------------
  /** Min-label propagation to fixpoint over a BIDIRECTIONAL edge list
    * (columns doc_a, doc_b); returns (doc_id, cluster_id) for every doc with
    * at least one edge.
    *
    * Propagation runs ONLY over docs that have an edge — near-dup members
    * are a small fraction of any healthy corpus, so the iterative joins
    * touch the pair subgraph, never the corpus; untouched docs join back at
    * the end as their own singleton cluster (see dedupClusters).
    *
    * localCheckpoint (not cache) per round: the label frame's LINEAGE
    * otherwise grows by two joins every iteration, and each round's action
    * re-analyzes the whole accumulated plan — driver planning time quickly
    * dwarfs the (tiny) stage work. Checkpointing truncates the plan to the
    * materialized blocks, keeping per-round planning cost constant — the
    * standard shape for iterative algorithms on DataFrames.
    *
    * Round-0 seeding folds the first propagation step into the init agg:
    * label_0 = min(self, direct neighbors) — one groupBy, no join. For the
    * dominant near-dup shape (pair cliques) this IS the fixpoint, so the
    * loop body runs once purely to confirm convergence — and that
    * confirmation is ONE job per round: the checkpoint is lazy, so the
    * convergence count both materializes the round's labels and measures
    * the delta in the same job (previously: one eager-checkpoint job plus a
    * separate count job per round). */
  def labelPropagate(pairs: DataFrame): DataFrame = {
    // Symmetrize LAZILY: `edges` is a narrow union of two column-swapped
    // scans of the (cached, already-materialized) pair frame — giving it its
    // own cache + priming count added a whole driver job for data the pair
    // cache already holds. Reading the cache twice per round is free by
    // comparison; the AQE-concurrent-subtree recompute hazard needs a COLD
    // cache, and `pairs` is primed before this runs (see dedupClusters).
    val edges = pairs.unionAll(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    var labels = edges.groupBy(col("doc_a").as("doc_id"))
      .agg(least(col("doc_a"), min(col("doc_b"))).as("cluster_id"))
      .localCheckpoint() // eager: the loop body reads it twice per job
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("cluster_id").as("nbr_label")),
          Seq("doc_b"))
        .groupBy(col("doc_a")).agg(min(col("nbr_label")).as("nbr_min"))
      // carry the previous label through the round so the convergence check
      // is a filter on this frame, not another join+job over both frames
      val next = labels
        .join(nbrMin.select(col("doc_a").as("doc_id"), col("nbr_min")), Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("prev"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(eager = false) // materialized by the count below
      changed = next.filter(col("cluster_id") =!= col("prev")).count()
      labels = next.select(col("doc_id"), col("cluster_id"))
    }
    labels
  }

  /** Edge lists at most this size are solved ON THE DRIVER with one
    * union-find pass (exact, same min-per-component answer) instead of
    * iterated distributed joins — the label map is then a broadcast-sized
    * artifact, like an ANN index's centroids. The near-dup pair graph of
    * a healthy corpus is orders smaller than the corpus, so at every test
    * SF (and most real ones) clustering costs one collect + one broadcast
    * join instead of 3+ fixpoint jobs; a genuinely huge pair graph (dirty
    * corpus at 100 TB) takes the distributed min-label fixpoint
    * unchanged. 1M edges ≈ 16 MB collected — dimension-table sized. */
  val MaxDriverEdges = 1000000L

  /** (doc_id, cluster_id) for every doc with an edge: driver union-find
    * under [[MaxDriverEdges]] (union-by-min root, path compression — the
    * root IS the component min), distributed [[labelPropagate]] above. */
  def connectedLabels(pairs: DataFrame, nPairs: Long): DataFrame =
    if (nPairs > MaxDriverEdges) labelPropagate(pairs)
    else {
      val spark = pairs.sparkSession
      import spark.implicits._
      val dt = pairs.schema("doc_a").dataType
      val edges = pairs
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nx = parent(c); parent(c) = r; c = nx
        }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          // union-by-min: the surviving root is the smaller id, so every
          // tree's root is its component's minimum at the end
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val members = edges.iterator.flatMap(e => Iterator(e._1, e._2))
        .toArray.distinct
      broadcast(members.toSeq.map(d => (d, find(d))).toDF("doc_id", "cluster_id")
        .select(col("doc_id").cast(dt).as("doc_id"),
          col("cluster_id").cast(dt).as("cluster_id")))
    }

  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = lazyCachedShingles(docs) // primed by cachedBands' count
    val pairs = verifyJaccard(lshCandidates(cachedBands(sh)), sh)
      .select(col("doc_a"), col("doc_b")).cache()
    // eager: every loop round references the edge set from several subtrees
    // that AQE submits concurrently — a lazy cache would recompute the whole
    // LSH verify chain per subtree per round (same failure mode as the
    // shingle cache; observed 5-20× blowup)
    val nPairs = pairs.count()
    val labels = connectedLabels(pairs, nPairs)
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }

  /** Oracle: the same pair graph, with the component minimum computed as a
    * RECURSIVE reachability closure — cluster_id(doc) = MIN(doc_id reachable
    * from doc), the exact single-linkage fixpoint with NO unroll horizon
    * (the historical 4-round unroll silently assumed min-label eccentricity
    * ≤ 4; a recursive CTE iterates until the frontier is empty, so any
    * diameter matches the Spark fixpoint by construction). The closure table
    * is Σ component_size² rows — near-dup components are tiny, so this stays
    * far smaller than the corpus. */
  val dedupClustersSql: String = {
    shinglesCte.replaceFirst("^WITH ", "WITH RECURSIVE ") + ",\n" +
      sigBandsCte + ",\n" + jaccardVerifyCtes(lshCandCte) + ",\n" +
      s"""pairs AS (SELECT doc_a, doc_b FROM ver),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (
         |  SELECT src AS doc_id, src AS r FROM edges
         |  UNION
         |  SELECT re.doc_id, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r),
         |lab AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(lb.cluster_id, d.doc_id) AS cluster_id,
         |  d.doc_id = COALESCE(lb.cluster_id, d.doc_id) AS is_canonical
         |FROM documents d LEFT JOIN lab lb ON lb.doc_id = d.doc_id""".stripMargin
  }

  val ngramJaccardSql: String =
    shinglesCte + ",\n" +
      jaccardTail(
        s"""rare AS (
           |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= $MaxShingleDf),
           |pruned AS (SELECT s.doc_id, s.shingle FROM sh s JOIN rare r ON r.shingle = s.shingle),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM pruned a JOIN pruned b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)""".stripMargin)

  // --------------------------------------------------------------------------
  // q_minhash_sig — the same signatures via the custom mergeable
  // TypedImperativeAggregate (functions.MinHashSketchAgg): one aggregate
  // call instead of NumHashes expression aggregates, buffer merged across
  // partials. Oracle is the expression formulation — identical by
  // construction, which is exactly the point (sketch == expression result).
  // --------------------------------------------------------------------------
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    shingles(Tables.documents(spark, dir))
      .groupBy(col("doc_id"))
      .agg(graft.functions.MinHashSketchAgg(col("shingle"), NumHashes).as("signature"))

  val minhashSignaturesSql: String = {
    val mins = (0 until NumHashes).map(mhExpr).mkString(", ")
    shinglesCte + "\n" +
      s"SELECT doc_id, concat_ws('|', $mins) AS signature FROM sh GROUP BY doc_id"
  }

  // --------------------------------------------------------------------------
  // q_simhash — 32-bit SimHash fingerprint per document. Bit j's source is
  // bit (j%4) of hex digit (j/4) of md5(word); per-doc vote = Σ(±1) over
  // distinct words; fingerprint bit = sign(vote).
  // --------------------------------------------------------------------------
  val SimhashBits = 32

  /** Per-doc SimHash bit votes for the first `bits` bits of md5(word):
    * bit j's source is bit (j%4) of hex digit (j/4); hex digits are decoded
    * ONCE per word (bits/4 exprs), bit votes are then cheap integer ops over
    * the decoded digits, not `bits` string parses. One hash-aggregate. */
  private def voteAgg(spark: SparkSession, dir: String, bits: Int): DataFrame = {
    val nDigits = bits / 4
    // doc_id-keyed spread: the vote aggregate below groups by doc_id, so it
    // reuses this exchange instead of adding its own (see Tables.spread)
    val wordsDf = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h", md5(col("w")))
      .select(col("doc_id") +: (0 until nDigits).map(p =>
        expr(s"CAST(conv(substring(h, ${p + 1}, 1), 16, 10) AS INT)").as(s"d$p")): _*)
    val votes = (0 until bits).map { j =>
      sum(expr(s"2 * ((shiftright(d${j / 4}, ${j % 4}) & 1)) - 1")).as(s"v$j")
    }
    wordsDf.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
  }

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val fingerprint = (0 until SimhashBits)
      .map(j => s"(CASE WHEN v$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    voteAgg(spark, dir, SimhashBits)
      .select(col("doc_id"), expr(s"CAST($fingerprint AS BIGINT)").as("simhash"))
  }

  val simhashSql: String = {
    val votes = (0 until SimhashBits).map { j =>
      val pos = j / 4 + 1
      val bit = j % 4
      s"SUM(2 * (((instr('0123456789abcdef', substring(h, $pos, 1)) - 1 >> $bit)) & 1) - 1) AS v$j"
    }.mkString(", ")
    val fingerprint = (0 until SimhashBits)
      .map(j => s"(CASE WHEN v$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH w AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
       |  FROM documents),
       |h AS (SELECT doc_id, md5(w) AS h FROM w),
       |votes AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($fingerprint AS BIGINT) AS simhash FROM votes""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_simhash_pairs — SimHash near-duplicate neighbor stats, 64-bit
  // fingerprints banded into 4×16-bit keys (pigeonhole: any pair within
  // hamming distance 3 shares at least one unchanged 16-bit band). Two
  // scale defenses on top of the banding (the 32-bit/8-bit-band variant
  // saturated: 256 buckets/band ⇒ in-bucket pairs grow quadratically):
  //
  //  1. IDENTICAL fingerprints are collapsed to one representative BEFORE
  //     banding (Manku et al., WWW'07 treat exact-fingerprint dups
  //     separately for the same reason). On this corpus that alone cuts
  //     candidates 4× (5 000 docs → 3 905 distinct fingerprints at sf0.1);
  //     on a real corpus full of exact dups it's the difference between
  //     O(dups²) and O(dups).
  //  2. A deterministic per-(band,key) bucket cap (first MaxBandBucket
  //     representatives by doc id): a degenerate bucket at 100× can no
  //     longer go quadratic. The cap is replicated in the oracle SQL and
  //     sized to be a no-op at test SFs (max observed bucket at sf0.1 is
  //     589 distinct fingerprints < 1024), asserted by NearDupSpec.
  //
  // Output is per-doc SYMMETRIC neighbor stats: n_neighbors counts every
  // other doc within hamming <= HammingThreshold sharing a band (group
  // members count each other via group sizes — no pairwise expansion of
  // identical-fingerprint groups, which would reintroduce the quadratic).
  // --------------------------------------------------------------------------
  val HammingThreshold = 3
  val SimhashPairBits = 64
  val SimhashBands = 4
  val BandBits: Int = SimhashPairBits / SimhashBands
  val MaxBandBucket = 1024

  /** doc_id with its 64-bit fingerprint as 4 int band keys (k0..k3). */
  def simhash64Keys(spark: SparkSession, dir: String): DataFrame = {
    val keyCols = (0 until SimhashBands).map { b =>
      val terms = (0 until BandBits)
        .map(r => s"(CASE WHEN v${b * BandBits + r} >= 0 THEN ${1 << r} ELSE 0 END)")
        .mkString(" + ")
      expr(s"CAST($terms AS INT)").as(s"k$b")
    }
    voteAgg(spark, dir, SimhashPairBits).select(col("doc_id") +: keyCols: _*)
  }

  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // fingerprints fan out to the group-collapse AND the per-doc join; cache
    // + eager count for the same AQE-concurrent-subtree reason as shingles
    val fps = simhash64Keys(spark, dir).cache()
    fps.count()
    bandedHammingFrame(fps)
      .filter(col("n_neighbors") > 0)
      .select(col("doc_id"), col("n_neighbors"),
        when(col("grp_size") > 1, lit(0L)).otherwise(col("min_h"))
          .cast(LongType).as("closest_hamming"))
  }

  /** The banded-hamming neighbor machinery over ANY (doc_id, k0..k3)
    * fingerprint frame — each k is one 16-bit band of a 64-bit perceptual
    * hash, so band-wise XOR popcount equals full-hash hamming and the
    * pigeonhole guarantee (distance ≤ 3 ⇒ one band agrees) holds. Shared
    * by the SimHash text path and the dHash image path (ImageHash):
    * identical-fingerprint collapse, deterministic per-(band,key) bucket
    * cap, symmetric cross-group stats. Returns every input doc with its
    * keys plus grp_size, n_neighbors, min_h (null when the doc has no
    * cross-group neighbor within [[HammingThreshold]]). `fps` should be
    * cached — it fans out to the collapse and the final per-doc join. */
  private[graft] def bandedHammingFrame(fps: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyNames = (0 until SimhashBands).map(b => s"k$b")
    val groups = fps.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("grp_size"), min(col("doc_id")).as("rep"))
    val banded = groups.select(
      Seq(col("rep"), col("grp_size")) ++ keyNames.map(col) :+
        explode(array((0 until SimhashBands).map(b =>
          struct(lit(b).as("band"), col(s"k$b").as("key"))): _*)).as("bk"): _*)
      .select(Seq(col("rep"), col("grp_size")) ++ keyNames.map(col) ++
        Seq(col("bk.band").as("band"), col("bk.key").as("key")): _*)
    val wBucket = Window.partitionBy(col("band"), col("key")).orderBy(col("rep"))
    val capped = banded
      .withColumn("rn", row_number().over(wBucket))
      .filter(col("rn") <= MaxBandBucket)
      .drop("rn")
    val a = capped.select(Seq(col("band"), col("key"), col("rep").as("rep_a")) ++
      keyNames.map(k => col(k).as(s"a_$k")): _*)
    val b = capped.select(Seq(col("band"), col("key"), col("rep").as("rep_b"),
      col("grp_size").as("sz_b")) ++ keyNames.map(k => col(k).as(s"b_$k")): _*)
    val hamming = (0 until SimhashBands)
      .map(i => bit_count(col(s"a_k$i").bitwiseXOR(col(s"b_k$i"))))
      .reduce(_ + _).cast(LongType)
    // r19: the hamming filter runs BEFORE the pair dedup, so only NEAR pairs
    // (a tiny fraction of each bucket's candidates) ever reach an exchange
    // (guide §2.3 — shuffle fewer bytes); and the dedup is a (rep_a, rep_b)
    // group-agg instead of distinct+re-shuffle, so the per-rep rollup below
    // clusters on a subset of its keys and reuses the same exchange (§2.4).
    // hamming and sz_b are constants of the pair (one fingerprint, one group
    // size per rep), so min() over the duplicate band hits reproduces the
    // old distinct's row exactly.
    val pairs = a.join(b, Seq("band", "key"))
      .filter(col("rep_a") =!= col("rep_b"))
      .select(col("rep_a"), col("rep_b"), hamming.as("hamming"), col("sz_b"))
      .filter(col("hamming") <= HammingThreshold)
      .groupBy(col("rep_a"), col("rep_b"))
      .agg(min(col("hamming")).as("hamming"), min(col("sz_b")).as("sz_b"))
    val crossAgg = pairs.groupBy(col("rep_a"))
      .agg(sum(col("sz_b")).as("cross_n"), min(col("hamming")).as("min_h"))
    fps.join(groups, keyNames)
      .join(crossAgg, col("rep") === col("rep_a"), "left")
      .withColumn("n_neighbors",
        (col("grp_size") - 1 + coalesce(col("cross_n"), lit(0L))).cast(LongType))
  }

  /** The keep-all output shape over [[bandedHammingFrame]] shared by the
    * image and video hashes: every doc with its band keys (the hash
    * identity) plus neighbor stats; zero-neighbor docs stay. */
  private[operators] def keepAllNeighborSelect(stats: DataFrame): DataFrame =
    stats.select(col("doc_id"), col("k0"), col("k1"), col("k2"), col("k3"),
      col("n_neighbors"),
      when(col("grp_size") > 1, lit(0L)).otherwise(col("min_h"))
        .cast(LongType).as("closest_hamming"))

  /** The banded-hamming neighbor-stats oracle TAIL shared by the image
    * and video perceptual hashes — the SQL twin of the keep-all consumers
    * of [[bandedHammingFrame]]. Expects a CTE `fp(doc_id, k0..k3)` in
    * scope; emits the collapse/cap/pair/aggregate chain and the final
    * keep-all select, so the cap and tie-break contracts live in ONE
    * place per language. (simhashPairs' oracle predates this and keeps
    * its filtered, keys-free output shape.) */
  private[operators] def bandedHammingTailSql: String = {
    val keyList = (0 until SimhashBands).map(b => s"k$b").mkString(", ")
    val bandSelects = (0 until SimhashBands).map(b =>
      s"SELECT rep, grp_size, $keyList, $b AS band, k$b AS key FROM grp")
      .mkString(" UNION ALL ")
    val hamming = (0 until SimhashBands)
      .map(i => s"bit_count(xor(a.k$i, b.k$i))").mkString(" + ")
    s"""grp AS (
       |  SELECT $keyList, COUNT(*) AS grp_size, MIN(doc_id) AS rep
       |  FROM fp GROUP BY $keyList),
       |banded AS ($bandSelects),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY band, key ORDER BY rep) AS rn
       |    FROM banded)
       |  WHERE rn <= $MaxBandBucket),
       |pairs AS (
       |  SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b,
       |    CAST($hamming AS BIGINT) AS hamming, b.grp_size AS sz_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.key = b.key AND a.rep <> b.rep),
       |near AS (SELECT * FROM pairs WHERE hamming <= $HammingThreshold),
       |cross_agg AS (
       |  SELECT rep_a, CAST(SUM(sz_b) AS BIGINT) AS cross_n, MIN(hamming) AS min_h
       |  FROM near GROUP BY rep_a)
       |SELECT f.doc_id, f.k0, f.k1, f.k2, f.k3,
       |  CAST(g.grp_size - 1 + COALESCE(c.cross_n, 0) AS BIGINT) AS n_neighbors,
       |  CAST(CASE WHEN g.grp_size > 1 THEN 0 ELSE c.min_h END AS BIGINT) AS closest_hamming
       |FROM fp f
       |JOIN grp g USING ($keyList)
       |LEFT JOIN cross_agg c ON c.rep_a = g.rep""".stripMargin
  }

  /** 64-bit vote CTEs (same decode as [[simhashSql]], wider). */
  private val simhash64KeysSql: String = {
    val votes = (0 until SimhashPairBits).map { j =>
      val pos = j / 4 + 1
      val bit = j % 4
      s"SUM(2 * (((instr('0123456789abcdef', substring(h, $pos, 1)) - 1 >> $bit)) & 1) - 1) AS v$j"
    }.mkString(", ")
    val keys = (0 until SimhashBands).map { b =>
      val terms = (0 until BandBits)
        .map(r => s"(CASE WHEN v${b * BandBits + r} >= 0 THEN ${1 << r} ELSE 0 END)")
        .mkString(" + ")
      s"CAST($terms AS INT) AS k$b"
    }.mkString(", ")
    s"""w AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
       |  FROM documents),
       |h AS (SELECT doc_id, md5(w) AS h FROM w),
       |votes AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
       |fp AS (SELECT doc_id, $keys FROM votes)""".stripMargin
  }

  val simhashPairsSql: String = {
    val keyList = (0 until SimhashBands).map(b => s"k$b").mkString(", ")
    val bandSelects = (0 until SimhashBands).map(b =>
      s"SELECT rep, grp_size, $keyList, $b AS band, k$b AS key FROM grp")
      .mkString(" UNION ALL ")
    val hamming = (0 until SimhashBands)
      .map(i => s"bit_count(xor(a.k$i, b.k$i))").mkString(" + ")
    s"""WITH $simhash64KeysSql,
       |grp AS (
       |  SELECT $keyList, COUNT(*) AS grp_size, MIN(doc_id) AS rep
       |  FROM fp GROUP BY $keyList),
       |banded AS ($bandSelects),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY band, key ORDER BY rep) AS rn
       |    FROM banded)
       |  WHERE rn <= $MaxBandBucket),
       |pairs AS (
       |  SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b,
       |    CAST($hamming AS BIGINT) AS hamming, b.grp_size AS sz_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.key = b.key AND a.rep <> b.rep),
       |near AS (SELECT * FROM pairs WHERE hamming <= $HammingThreshold),
       |cross_agg AS (
       |  SELECT rep_a, CAST(SUM(sz_b) AS BIGINT) AS cross_n, MIN(hamming) AS min_h
       |  FROM near GROUP BY rep_a)
       |SELECT f.doc_id,
       |  CAST(g.grp_size - 1 + COALESCE(c.cross_n, 0) AS BIGINT) AS n_neighbors,
       |  CAST(CASE WHEN g.grp_size > 1 THEN 0 ELSE c.min_h END AS BIGINT) AS closest_hamming
       |FROM fp f
       |JOIN grp g USING ($keyList)
       |LEFT JOIN cross_agg c ON c.rep_a = g.rep
       |WHERE g.grp_size - 1 + COALESCE(c.cross_n, 0) > 0""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_embed_neardup — embedding-cosine near-duplicate pairs via banded
  // random-hyperplane LSH (the 100 TB shape). Candidate pairs come from an
  // EQUI-join on (band, sign-pattern key): two vectors are candidates iff
  // they agree on all EmbedPlanesPerBand hyperplane signs of at least one
  // band, so the shuffle key cardinality is O(vectors × bands), never
  // O(vectors²). Exact cosine re-ranks candidates; the brute-force all-pairs
  // variant survives as `embedNearDupBrute`, the spec's ground-truth
  // differential (NearDupSpec), exactly as ngramJaccardPairs anchors the
  // minhash path. Hyperplane coefficients are md5-derived on the driver and
  // embedded as literals in both engines — no runtime randomness.
  // --------------------------------------------------------------------------
  val CosineThreshold = 0.5
  val EmbedBands = 4
  val EmbedPlanesPerBand = 4
  val EmbedDim = 64

  /** Deterministic pseudo-random hyperplanes (EmbedBands × EmbedPlanesPerBand
    * × EmbedDim), coefficients from md5 hex byte pairs centered on zero —
    * exact halves, bit-identical when rendered as SQL literals. */
  lazy val embedPlanes: Seq[Seq[Array[Double]]] = {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    Seq.tabulate(EmbedBands, EmbedPlanesPerBand) { (b, p) =>
      val hex = (0 until 4).map(c => md5hex(s"embband$b-plane$p-$c")).mkString
      Array.tabulate(EmbedDim)(d =>
        Integer.parseInt(hex.substring(d * 2, d * 2 + 2), 16) - 127.5)
    }
  }

  /** Hyperplane sign bits for one band. The dot product is ROUNDED before
    * the sign test (repo convention, same as the cosine round(,6)): the
    * oracle recomputes it with DuckDB's list_sum, and a raw float sum within
    * rounding error of zero could flip sign on one engine only from
    * summation order — silently changing the candidate set. */
  private def embedBandKey(v: Column, band: Int): Column = {
    import graft.functions.VectorFunctions._
    (0 until EmbedPlanesPerBand).map { p =>
      when(round(dot(typedLit(embedPlanes(band)(p).toSeq), v), 6) >= 0.0, lit(1 << p))
        .otherwise(lit(0))
    }.reduce(_ + _)
  }

  private def embeddingVectors(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    // vec_id-keyed spread: the candidate-fetch joins re-key this frame by
    // vec_id, so hash(vec_id) partitioning spares their corpus-side exchange
    Tables.spread(Tables.embeddings(spark, dir), col("vec_id"))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
  }

  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val emb = embeddingVectors(spark, dir)
    // (vec_id, band, key): the only thing that shuffles at candidate time —
    // a few ints per vector, not the vectors themselves
    val banded = emb
      .select(col("vec_id"), posexplode(
        array((0 until EmbedBands).map(b => embedBandKey(col("v"), b)): _*))
        .as(Seq("band", "key")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    // fetch vectors only for surviving candidates, then exact re-rank
    val va = emb.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val vb = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .withColumn("cosine", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= CosineThreshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** All-pairs ground truth for the spec differential — quadratic by
    * construction; deliberately NOT a declared query (at 100 TB you never
    * run this; NearDupSpec uses it to measure the LSH variant's recall). */
  def embedNearDupBrute(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val emb = embeddingVectors(spark, dir)
    val a = emb.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= CosineThreshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  lazy val embedNearDupSql: String = {
    def lit64(a: Array[Double]): String = a.mkString("[", ", ", "]")
    def keyExpr(band: Int): String = (0 until EmbedPlanesPerBand).map { p =>
      s"""(CASE WHEN ROUND(list_sum(list_transform(range(1, LEN(v) + 1),
         |  i -> (${lit64(embedPlanes(band)(p))})[i] * v[i])), 6) >= 0.0 THEN ${1 << p} ELSE 0 END)"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(" + ")
    val keyCols = (0 until EmbedBands).map(b => s"${keyExpr(b)} AS k$b").mkString(",\n    ")
    val bandSelects = (0 until EmbedBands)
      .map(b => s"SELECT vec_id, $b AS band, k$b AS key FROM n")
      .mkString(" UNION ALL ")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
       |    $keyCols
       |  FROM v),
       |banded AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
       |SELECT c.vec_a, c.vec_b,
       |  ROUND(list_sum(list_transform(range(1, LEN(x.v) + 1), i -> x.v[i] * y.v[i]))
       |    / (x.nrm * y.nrm), 6) AS cosine
       |FROM cand c
       |JOIN n x ON x.vec_id = c.vec_a
       |JOIN n y ON y.vec_id = c.vec_b
       |WHERE ROUND(list_sum(list_transform(range(1, LEN(x.v) + 1), i -> x.v[i] * y.v[i]))
       |    / (x.nrm * y.nrm), 6) >= $CosineThreshold""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_incremental_dedup — CONTINUOUS-INGESTION dedup: a NEW batch of
  // documents (doc_id % IncrMod == 0 stands in for "today's crawl") dedups
  // against the EXISTING corpus without recomputing any corpus-internal
  // pair. The batch's band keys probe the corpus band index; only banded
  // (batch, corpus) candidates reach the exact-Jaccard verify; every batch
  // doc reports its duplicate count, best corpus match and keep/drop flag.
  //
  // Plan at 100 TB: this is the shape that makes LSH dedup OPERATIONALLY
  // viable — the corpus band index is write-once (here recomputed so the
  // DuckDB oracle can replicate it; in production it persists as a graft
  // table keyed by (band, key)), the daily batch is ~1/1000 of the corpus,
  // and the probe is one shuffle join on (band, key) whose output is
  // bounded by banding, never |batch| × |corpus|. The final per-batch-doc
  // aggregate and left join are batch-sized. Corpus-internal pairs are
  // never materialized, which is exactly the asymptotic win over rerunning
  // q_minhash_lsh on corpus+batch.
  // --------------------------------------------------------------------------
  val IncrMod = 10L

  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // one shingle/band pass over ALL docs, split afterwards: cheaper than
    // two scans at test scale; production keeps the corpus side persisted
    val sh = lazyCachedShingles(docs) // primed by cachedBands' count
    val bands = cachedBands(sh)
    val cand = bands.filter(col("doc_id") % IncrMod === 0)
      .select(col("band"), col("key"), col("doc_id").as("doc_a"))
      .join(bands.filter(col("doc_id") % IncrMod =!= 0)
        .select(col("band"), col("key"), col("doc_id").as("doc_b")),
        Seq("band", "key"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val ver = verifyJaccard(cand, sh) // (doc_a=batch, doc_b=corpus, jaccard)
    val best = ver.groupBy(col("doc_a"))
      .agg(count(lit(1)).as("n_dups"),
        max(struct(col("jaccard"), col("doc_b"))).as("m"))
    docs.filter(col("doc_id") % IncrMod === 0)
      .select(col("doc_id").as("doc_a"))
      .join(best, Seq("doc_a"), "left")
      .select(col("doc_a").as("doc_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("m.doc_b").as("dup_of"),
        round(col("m.jaccard"), 6).as("jaccard"),
        col("m").isNotNull.as("is_dup"))
  }

  val incrementalDedupSql: String = {
    val incrCand =
      s"""cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key
         |  WHERE a.doc_id % $IncrMod = 0 AND b.doc_id % $IncrMod <> 0)""".stripMargin
    shinglesCte + ",\n" + sigBandsCte + ",\n" +
      jaccardVerifyCtes(incrCand) + ",\n" +
      s"""best AS (
         |  SELECT doc_a, COUNT(*) AS n_dups,
         |    MAX({'jaccard': jaccard, 'doc_b': doc_b}) AS m
         |  FROM ver GROUP BY doc_a)
         |SELECT d.doc_id, COALESCE(b.n_dups, 0) AS n_dups,
         |  b.m.doc_b AS dup_of, ROUND(b.m.jaccard, 6) AS jaccard,
         |  b.m IS NOT NULL AS is_dup
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $IncrMod = 0) d
         |LEFT JOIN best b ON b.doc_a = d.doc_id""".stripMargin
  }

  // --------------------------------------------------------------------------

  // --------------------------------------------------------------------------
  // q_stream_dedup — the STREAMING incremental-dedup path under the oracle
  // gate: the corpus arrives as StreamSlices ordered micro-batches
  // (doc_id % StreamSlices plays "arrival day"), each processed by the
  // REAL streaming sink body (StreamingSilver.dedupMicroBatch — persisted
  // band index in a versioned table, decisions committed exactly-once),
  // and the accumulated decisions table is the query result. The DuckDB
  // oracle unrolls the three batch steps as pure set logic over the
  // signature-agreement pair table — survivors of batch b-1 form batch
  // b's index — so a green row proves the streaming path's stateful
  // decisions (history probe, intra-batch first-occurrence-wins,
  // duplicates-never-index) end-to-end, not just in specs.
  //
  // The fixture keys on the source data fingerprint; re-running the
  // batches is a per-table (appId, batchId) no-op, so the build is
  // crash-resumable by construction.
  // --------------------------------------------------------------------------
  val StreamSlices = 3

  private def streamDedupFixture(dir: String): String =
    graft.queries.SkippingQueries.cachedFixturePath(
      dir, "streamdedup_v1", "documents.parquet")

  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val base = streamDedupFixture(dir)
    (0 until StreamSlices).foreach { b =>
      graft.streaming.StreamingSilver.dedupMicroBatch(
        docs.filter(col("doc_id") % StreamSlices === b), b.toLong,
        s"$base/index", s"$base/decisions", appId = "graft-qstream")
    }
    graft.sources.VersionedTable.read(spark, s"$base/decisions")
  }

  val streamDedupSql: String = {
    val matches = (0 until NumHashes)
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
    def batchDocs(b: Int) =
      s"(SELECT doc_id FROM documents WHERE doc_id % $StreamSlices = $b)"
    shinglesCte + ",\n" + sigBandsCte + ",\n" +
      s"""apairs AS (
         |  SELECT DISTINCT x.doc_id AS d, y.doc_id AS c
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.key = y.key AND x.doc_id <> y.doc_id),
         |est AS (
         |  SELECT p.d, p.c, CAST($matches AS DOUBLE) / $NumHashes AS est
         |  FROM apairs p
         |  JOIN sig a ON a.doc_id = p.d
         |  JOIN sig b ON b.doc_id = p.c
         |  WHERE CAST($matches AS DOUBLE) / $NumHashes >= $JaccardThreshold),
         |dup0 AS (
         |  SELECT e.d AS doc_id, COUNT(DISTINCT e.c) AS n_dups,
         |    MAX({'est': e.est, 'c': e.c}) AS m
         |  FROM est e
         |  WHERE e.d % $StreamSlices = 0 AND e.c % $StreamSlices = 0
         |    AND e.c < e.d
         |  GROUP BY 1),
         |surv0 AS (SELECT doc_id FROM ${batchDocs(0)} d0
         |  WHERE doc_id NOT IN (SELECT doc_id FROM dup0)),
         |dup1 AS (
         |  SELECT e.d AS doc_id, COUNT(DISTINCT e.c) AS n_dups,
         |    MAX({'est': e.est, 'c': e.c}) AS m
         |  FROM est e
         |  WHERE e.d % $StreamSlices = 1
         |    AND (e.c IN (SELECT doc_id FROM surv0)
         |      OR (e.c % $StreamSlices = 1 AND e.c < e.d))
         |  GROUP BY 1),
         |surv1 AS (SELECT doc_id FROM ${batchDocs(1)} d1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM dup1)),
         |dup2 AS (
         |  SELECT e.d AS doc_id, COUNT(DISTINCT e.c) AS n_dups,
         |    MAX({'est': e.est, 'c': e.c}) AS m
         |  FROM est e
         |  WHERE e.d % $StreamSlices = 2
         |    AND (e.c IN (SELECT doc_id FROM surv0)
         |      OR e.c IN (SELECT doc_id FROM surv1)
         |      OR (e.c % $StreamSlices = 2 AND e.c < e.d))
         |  GROUP BY 1),
         |dec AS (
         |  SELECT d0.doc_id, 0 AS b, u.n_dups, u.m
         |  FROM ${batchDocs(0)} d0 LEFT JOIN dup0 u USING (doc_id)
         |  UNION ALL
         |  SELECT d1.doc_id, 1 AS b, u.n_dups, u.m
         |  FROM ${batchDocs(1)} d1 LEFT JOIN dup1 u USING (doc_id)
         |  UNION ALL
         |  SELECT d2.doc_id, 2 AS b, u.n_dups, u.m
         |  FROM ${batchDocs(2)} d2 LEFT JOIN dup2 u USING (doc_id))
         |SELECT doc_id, CAST(b AS BIGINT) AS batch_id,
         |  COALESCE(n_dups, 0) AS n_dups, m.c AS dup_of,
         |  m.est AS est_jaccard, m IS NOT NULL AS is_dup
         |FROM dec""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_dedup" -> (streamDedup _),
    "q_incremental_dedup" -> (incrementalDedup _),
    "q_minhash_lsh"   -> (minhashLsh _),
    "q_dedup_clusters" -> (dedupClusters _),
    "q_minhash_estimate" -> (minhashEstimate _),
    "q_minhash_sig"   -> (minhashSignatures _),
    "q_ngram_jaccard" -> (ngramJaccardPairs _),
    "q_simhash"       -> (simhash _),
    "q_simhash_pairs" -> (simhashPairs _),
    "q_embed_neardup" -> (embedNearDup _),
  )

  val oracles: Map[String, String] = Map(
    "q_stream_dedup" -> streamDedupSql,
    "q_incremental_dedup" -> incrementalDedupSql,
    "q_minhash_lsh"   -> minhashLshSql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_minhash_estimate" -> minhashEstimateSql,
    "q_minhash_sig"   -> minhashSignaturesSql,
    "q_ngram_jaccard" -> ngramJaccardSql,
    "q_simhash"       -> simhashSql,
    "q_simhash_pairs" -> simhashPairsSql,
    "q_embed_neardup" -> embedNearDupSql,
  )
}
