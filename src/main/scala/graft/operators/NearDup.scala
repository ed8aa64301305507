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
    * Repartitioning a few MB of text is noise next to that. */
  def shingles(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= ShingleSize)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ws) - $ShingleSize), i -> concat_ws(' ', slice(ws, i + 1, $ShingleSize)))"))
        .as("shingle"))
      .distinct()

  /** MinHash signature: NumHashes independent hash functions simulated by
    * salting the shingle before md5; per-function minimum over the doc's
    * shingle set. One hash-aggregate. */
  def signatures(sh: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(i =>
      min(md5(concat(col("shingle"), lit(s"#$i")))).as(s"mh$i"))
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

  /** Cache + eager materialization: the shingle set fans out to 4-5 consumer
    * subtrees which AQE submits CONCURRENTLY — with a lazy cache they all
    * miss and recompute the chain in parallel (observed 5× redundant work).
    * One count() fills the cache before the fan-out. */
  private def cachedShingles(docs: DataFrame): DataFrame = {
    val sh = shingles(docs).cache()
    sh.count()
    sh
  }

  // --------------------------------------------------------------------------
  // q_minhash_lsh — MinHash+LSH candidates, exact-Jaccard verified.
  // --------------------------------------------------------------------------
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = cachedShingles(Tables.documents(spark, dir))
    verifyJaccard(lshCandidates(bandKeys(signatures(sh))), sh)
  }

  // --------------------------------------------------------------------------
  // q_ngram_jaccard — exact all-pairs n-gram Jaccard via inverted-index join:
  // intersection counts come straight off the shingle self-join (no separate
  // candidate materialization + re-join).
  // --------------------------------------------------------------------------
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = cachedShingles(Tables.documents(spark, dir))
    val inter = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    jaccardFromInter(inter, sh)
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

  private def jaccardTail(candCte: String): String =
    s"""$candCte,
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |  CAST(i.inter AS DOUBLE) / (na.n + nb.n - i.inter) AS jaccard
       |FROM inter i
       |JOIN sizes na ON na.doc_id = i.doc_a
       |JOIN sizes nb ON nb.doc_id = i.doc_b
       |WHERE CAST(i.inter AS DOUBLE) / (na.n + nb.n - i.inter) >= $JaccardThreshold""".stripMargin

  val minhashLshSql: String = {
    val mhCols = (0 until NumHashes)
      .map(i => s"MIN(md5(shingle || '#$i')) AS mh$i").mkString(", ")
    val bandSelects = (0 until NumBands).map { b =>
      val parts = (0 until BandRows).map(r => s"mh${b * BandRows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $parts)) AS key FROM sig"
    }.mkString(" UNION ALL ")
    shinglesCte + ",\n" +
      s"""sig AS (SELECT doc_id, $mhCols FROM sh GROUP BY doc_id),
         |bands AS ($bandSelects)""".stripMargin + ",\n" +
      jaccardTail(
        """cand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM bands a JOIN bands b
          |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin)
  }

  val ngramJaccardSql: String =
    shinglesCte + ",\n" +
      jaccardTail(
        """cand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)""".stripMargin)

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
    val mins = (0 until NumHashes)
      .map(i => s"MIN(md5(shingle || '#$i'))").mkString(", ")
    shinglesCte + "\n" +
      s"SELECT doc_id, concat_ws('|', $mins) AS signature FROM sh GROUP BY doc_id"
  }

  // --------------------------------------------------------------------------
  // q_simhash — 32-bit SimHash fingerprint per document. Bit j's source is
  // bit (j%4) of hex digit (j/4) of md5(word); per-doc vote = Σ(±1) over
  // distinct words; fingerprint bit = sign(vote).
  // --------------------------------------------------------------------------
  val SimhashBits = 32

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val nDigits = SimhashBits / 4
    // hex digits decoded ONCE per word (8 exprs), bit votes are then cheap
    // integer ops (32 exprs over the decoded digits, not 32 string parses)
    val wordsDf = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h", md5(col("w")))
      .select(col("doc_id") +: (0 until nDigits).map(p =>
        expr(s"CAST(conv(substring(h, ${p + 1}, 1), 16, 10) AS INT)").as(s"d$p")): _*)
    val votes = (0 until SimhashBits).map { j =>
      sum(expr(s"2 * ((shiftright(d${j / 4}, ${j % 4}) & 1)) - 1")).as(s"v$j")
    }
    val fingerprint = (0 until SimhashBits)
      .map(j => s"(CASE WHEN v$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    wordsDf.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
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
  // q_simhash_pairs — SimHash near-duplicate pairs via byte banding: split
  // the 32-bit fingerprint into 4 bytes; by pigeonhole, any pair within
  // hamming distance 3 shares at least one unchanged byte, so the
  // candidate join touches only per-(band, byte) buckets — never all
  // pairs — and the exact hamming check runs on candidates only. (At
  // larger corpus scale the same structure uses a 64-bit fingerprint with
  // 16-bit bands, shrinking bucket collision rates.)
  // --------------------------------------------------------------------------
  val HammingThreshold = 3

  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sims = simhash(spark, dir)
    val banded = sims.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    // this synthetic corpus's tiny vocabulary clusters the fingerprint
    // space hard (1.5M raw pairs at sf0.1), so the query reports per-doc
    // neighbor statistics rather than materializing the quadratic pair list
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= HammingThreshold)
      .groupBy(col("doc_a"))
      .agg(count(lit(1)).as("n_neighbors"), min(col("hamming")).as("closest_hamming"))
  }

  val simhashPairsSql: String = {
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 8}) & 255 AS key FROM sims")
      .mkString(" UNION ALL ")
    s"""WITH sims AS (
       |$simhashSql
       |),
       |banded AS ($bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingThreshold)
       |SELECT doc_a, COUNT(*) AS n_neighbors, MIN(hamming) AS closest_hamming
       |FROM pairs GROUP BY doc_a""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_embed_neardup — embedding-cosine near-duplicate pairs (brute force;
  // the ANN bucketed variant is the scale path, see SimilarityQueries).
  // --------------------------------------------------------------------------
  val CosineThreshold = 0.5

  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    // the corpus parquet is a single row group → one input split; spread the
    // streamed side so the O(n²) pair loop uses every core
    val a = emb.repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= CosineThreshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  val embedNearDupSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ROUND(list_sum(list_transform(range(1, LEN(a.v) + 1), i -> a.v[i] * b.v[i]))
       |    / (a.nrm * b.nrm), 6) AS cosine
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE ROUND(list_sum(list_transform(range(1, LEN(a.v) + 1), i -> a.v[i] * b.v[i]))
       |    / (a.nrm * b.nrm), 6) >= $CosineThreshold""".stripMargin

  // --------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_minhash_lsh"   -> (minhashLsh _),
    "q_minhash_sig"   -> (minhashSignatures _),
    "q_ngram_jaccard" -> (ngramJaccardPairs _),
    "q_simhash"       -> (simhash _),
    "q_simhash_pairs" -> (simhashPairs _),
    "q_embed_neardup" -> (embedNearDup _),
  )

  val oracles: Map[String, String] = Map(
    "q_minhash_lsh"   -> minhashLshSql,
    "q_minhash_sig"   -> minhashSignaturesSql,
    "q_ngram_jaccard" -> ngramJaccardSql,
    "q_simhash"       -> simhashSql,
    "q_simhash_pairs" -> simhashPairsSql,
    "q_embed_neardup" -> embedNearDupSql,
  )
}
