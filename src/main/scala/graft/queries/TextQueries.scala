package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Training-data text operators over the `documents` table: exact dedup,
  * quality scoring, token counting, language-ID heuristic, fingerprinting,
  * benchmark decontamination, sequence packing, repetition filtering,
  * domain-mixture weighting, deterministic training-order shuffle. The
  * per-row operators are narrow scan → project → (optional) single hash
  * aggregation; decontamination adds one BROADCAST join (bench side tiny,
  * corpus never shuffles), packing/shuffling one bounded-shard window —
  * each operator's header states its own plan shape and why it holds at
  * 100 TB.
  */
object TextQueries {

  // --------------------------------------------------------------------------
  // q_dedup_exact — exact duplicate grouping by content hash (hash-groupBy
  // dedup; the keep-lowest-id rule is the deterministic survivor policy).
  // --------------------------------------------------------------------------
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_text_quality — per-document quality metrics (length/stopword/diversity
  // signals) + composite score.
  // --------------------------------------------------------------------------
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(col("text")).cast(LongType).as("n_chars"),
      wordCount(col("text")).as("n_words"),
      distinctWordCount(col("text")).as("n_distinct_words"),
      avgWordLen(col("text")).as("avg_word_len"),
      stopwordRatio(col("text")).as("stopword_ratio"),
      qualityScore(col("text")).as("quality_score"))

  val textQualitySql: String = {
    val stop = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |  LENGTH(text) AS n_chars,
       |  CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_words,
       |  CAST(LEN(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_words,
       |  CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / LEN(string_split(text, ' ')) AS avg_word_len,
       |  CAST(LEN(list_filter(string_split(text, ' '), w -> w IN ($stop))) AS DOUBLE)
       |    / LEN(string_split(text, ' ')) AS stopword_ratio,
       |  CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE) / LEN(string_split(text, ' ')) * 0.5
       |    + LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.5 AS quality_score
       |FROM documents""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_token_count — whitespace tokens + BPE-ish regex token classes
  // (word / number / punctuation runs).
  // --------------------------------------------------------------------------
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      wordCount(col("text")).as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+")).cast(LongType).as("alpha_tokens"),
      regexp_count(col("text"), lit("[0-9]+")).cast(LongType).as("num_tokens"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(LEN(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(LEN(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS alpha_tokens,
      |  CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS num_tokens
      |FROM documents""".stripMargin

  // --------------------------------------------------------------------------
  // q_lang_id — stopword-vote language heuristic (n-gram-style evidence
  // counting; first-match-wins tie policy, deterministic).
  // --------------------------------------------------------------------------
  private val EnMarkers = Seq("the", "a", "of", "and")
  private val EsMarkers = Seq("el", "la", "de", "y")
  private val DeMarkers = Seq("der", "die", "das", "und")

  def langId(spark: SparkSession, dir: String): DataFrame = {
    def hits(ms: Seq[String]) =
      size(filter(words(col("text")), w => w.isInCollection(ms))).cast(LongType)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        hits(EnMarkers).as("en_hits"), hits(EsMarkers).as("es_hits"),
        hits(DeMarkers).as("de_hits"))
      .withColumn("predicted_lang",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits"), "en")
          .when(col("es_hits") >= col("de_hits"), "es")
          .otherwise("de"))
  }

  val langIdSql: String = {
    def inList(ms: Seq[String]) = ms.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, lang AS labeled_lang,
       |  CAST(LEN(list_filter(string_split(text, ' '), w -> w IN (${inList(EnMarkers)}))) AS BIGINT) AS en_hits,
       |  CAST(LEN(list_filter(string_split(text, ' '), w -> w IN (${inList(EsMarkers)}))) AS BIGINT) AS es_hits,
       |  CAST(LEN(list_filter(string_split(text, ' '), w -> w IN (${inList(DeMarkers)}))) AS BIGINT) AS de_hits,
       |  CASE
       |    WHEN LEN(list_filter(string_split(text, ' '), w -> w IN (${inList(EnMarkers)})))
       |         >= LEN(list_filter(string_split(text, ' '), w -> w IN (${inList(EsMarkers)})))
       |     AND LEN(list_filter(string_split(text, ' '), w -> w IN (${inList(EnMarkers)})))
       |         >= LEN(list_filter(string_split(text, ' '), w -> w IN (${inList(DeMarkers)})))
       |    THEN 'en'
       |    WHEN LEN(list_filter(string_split(text, ' '), w -> w IN (${inList(EsMarkers)})))
       |         >= LEN(list_filter(string_split(text, ' '), w -> w IN (${inList(DeMarkers)})))
       |    THEN 'es'
       |    ELSE 'de' END AS predicted_lang
       |FROM documents""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_doc_fingerprint — order-insensitive bag-of-words fingerprint + cluster
  // sizes (near-dup grouping under word reordering).
  // --------------------------------------------------------------------------
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(bowFingerprint(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("cluster_size"))

  val docFingerprintSql: String =
    """SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fingerprint,
      |  MIN(doc_id) AS keep_doc_id, COUNT(*) AS cluster_size
      |FROM documents GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_tfidf — top-k characteristic terms per document by tf-idf, the
  // standard corpus-statistics text op (feature extraction / topical dedup
  // support). Plan at scale: one hash agg for per-(doc,word) tf, one for
  // per-word df (both map-side partial), a shuffle join of tf⋈df on word
  // (df is vocabulary-sized — orders smaller than the corpus), and a per-doc
  // window for top-k. N (corpus size) enters as a broadcast one-row cross
  // join, never an action on the driver.
  //
  // Determinism: idf = ln((N+1)/(df+1)) rounded to 6 digits before the
  // multiply, score rounded to 6 — both engines use IEEE doubles and
  // correctly-rounded ln, and rounding absorbs the last ulp (SURVEY §7.4).
  // --------------------------------------------------------------------------
  val TfidfTopK = 3

  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // doc_id-keyed spread: the (doc_id, word) tf aggregate and the per-doc
    // top-k window both cluster on doc_id, so they reuse this one exchange
    val words = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    // df derived FROM tf, not from a second explode pass: tf has exactly one
    // row per (doc_id, word), so COUNT(*) per word over tf equals
    // COUNT(DISTINCT doc_id) per word over raw words. At scale the tf
    // subtree's exchange is shared via ReuseExchange, so the corpus is
    // exploded and shuffled ONCE, and df's shuffle input is the
    // pre-aggregated pair set instead of every token occurrence (guide §2.3
    // aggregate-before-shuffle).
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(countDistinct(col("doc_id")).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    tf.join(df, "word")
      .join(broadcast(n))
      .withColumn("idf", round(log((col("n") + 1).cast(DoubleType) / (col("df") + 1)), 6))
      .withColumn("score", round(col("tf") * col("idf"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TfidfTopK)
      .select(col("doc_id"), col("rk").cast(LongType).as("rk"),
        col("word"), col("tf"), col("score"))
  }

  val tfidfSql: String =
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2),
       |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
       |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.word, tf.tf,
       |    ROUND(tf.tf * ROUND(ln((n.n + 1) / CAST(df.df + 1 AS DOUBLE)), 6), 6) AS score
       |  FROM tf JOIN df USING (word) CROSS JOIN n),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, word ASC) AS rk
       |  FROM scored)
       |SELECT doc_id, rk, word, tf, score FROM ranked WHERE rk <= $TfidfTopK""".stripMargin

  // --------------------------------------------------------------------------
  // q_curation_funnel — the end-to-end curation accounting every training-
  // data pipeline needs: how many documents and tokens survive each stage of
  // raw → language filter → quality filter → exact dedup. One narrow pass
  // computes per-doc flags; stage counts are conditional aggregates; the
  // dedup stage groups on content hash keeping min(struct(doc_id, tokens))
  // so survivor token totals need NO join-back. Two shuffles total (one
  // global agg, one hash-group agg) regardless of corpus size.
  // --------------------------------------------------------------------------
  val QualityThreshold = 0.5

  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"), col("text"),
      wordCount(col("text")).as("toks"),
      qualityScore(col("text")).as("q"))
      .withColumn("is_en", col("lang") === "en")
      .withColumn("is_q", col("lang") === "en" && col("q") >= QualityThreshold)
    val stages = base.agg(
      count(lit(1)).as("raw_docs"), sum(col("toks")).as("raw_tokens"),
      sum(when(col("is_en"), 1L).otherwise(0L)).as("lang_docs"),
      sum(when(col("is_en"), col("toks")).otherwise(0L)).as("lang_tokens"),
      sum(when(col("is_q"), 1L).otherwise(0L)).as("quality_docs"),
      sum(when(col("is_q"), col("toks")).otherwise(0L)).as("quality_tokens"))
    val dedup = base.filter(col("is_q"))
      .groupBy(md5(col("text")).as("th"))
      .agg(min(struct(col("doc_id"), col("toks"))).as("keep"))
      .agg(count(lit(1)).as("dedup_docs"),
        sum(col("keep.toks")).as("dedup_tokens"))
    stages.join(dedup)
  }

  val curationFunnelSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, lang, text,
       |    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS toks,
       |    CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE) / LEN(string_split(text, ' ')) * 0.5
       |      + LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.5 AS q
       |  FROM documents),
       |flagged AS (
       |  SELECT *, lang = 'en' AS is_en,
       |    lang = 'en' AND q >= $QualityThreshold AS is_q
       |  FROM base),
       |stages AS (
       |  SELECT COUNT(*) AS raw_docs, CAST(SUM(toks) AS BIGINT) AS raw_tokens,
       |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS lang_docs,
       |    CAST(SUM(CASE WHEN is_en THEN toks ELSE 0 END) AS BIGINT) AS lang_tokens,
       |    CAST(SUM(CASE WHEN is_q THEN 1 ELSE 0 END) AS BIGINT) AS quality_docs,
       |    CAST(SUM(CASE WHEN is_q THEN toks ELSE 0 END) AS BIGINT) AS quality_tokens
       |  FROM flagged),
       |canon AS (
       |  SELECT md5(text) AS th, MIN({'doc_id': doc_id, 'toks': toks}) AS keep
       |  FROM flagged WHERE is_q GROUP BY 1),
       |dedup AS (
       |  SELECT COUNT(*) AS dedup_docs,
       |    CAST(SUM(keep.toks) AS BIGINT) AS dedup_tokens
       |  FROM canon)
       |SELECT * FROM stages CROSS JOIN dedup""".stripMargin

  // --------------------------------------------------------------------------
  // q_stratified_sample — deterministic per-stratum sampling, the way a
  // 100 TB pipeline downsamples: keep a row iff the first two hex digits of
  // md5(doc_id) fall under the stratum's threshold. A pure narrow filter —
  // no shuffle, no RNG state, reproducible across engines, partitionings,
  // and reruns (sample membership is a function of the ROW, so late
  // re-processing keeps the same sample). Thresholds are exact multiples of
  // 1/256: en 50% ('80'), es 25% ('40'), de 12.5% ('20').
  // --------------------------------------------------------------------------
  val SampleThresholds: Seq[(String, String)] =
    Seq("en" -> "80", "es" -> "40", "de" -> "20")

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    val keep = SampleThresholds.foldLeft(lit(false)) { case (acc, (lang, thr)) =>
      acc || (col("lang") === lang && bucket < lit(thr))
    }
    Tables.documents(spark, dir)
      .filter(keep)
      .select(col("doc_id"), col("lang"), bucket.as("sample_bucket"))
  }

  val stratifiedSampleSql: String = {
    val conds = SampleThresholds
      .map { case (l, t) => s"(lang = '$l' AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$t')" }
      .mkString(" OR ")
    s"""SELECT doc_id, lang,
       |  substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS sample_bucket
       |FROM documents
       |WHERE $conds""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_decontaminate — benchmark DECONTAMINATION, the training-data op every
  // serious pipeline runs before pretraining: flag (to drop) every training
  // document that shares an n-gram with the held-out evaluation set, so the
  // model can't be graded on text it memorized. Benchmark membership here is
  // a deterministic doc_id slice (`doc_id % 19 == 0`, ~5%) standing in for
  // the external eval files a real run would load.
  //
  // Plan at 100 TB: the BENCHMARK side is always tiny (thousands of docs →
  // millions of shingles), so its distinct shingle set BROADCASTS; the
  // training side streams through one narrow explode → broadcast-hash
  // semi-ish inner join → per-doc count — no shuffle of the corpus, no
  // candidate blowup (the join key is the shingle, and only matching
  // shingles survive the broadcast probe). Linear in corpus size.
  // --------------------------------------------------------------------------
  val DecontShingle = 5
  val BenchMod = 19

  /** (doc_id, shingle) pairs WITHOUT dedup — the corpus-side producer must
    * stay a pure narrow explode (a distinct here would hash-shuffle ~5× the
    * corpus before any probe). Consumers dedup on whatever tiny set
    * survives their join/filter. */
  private def wsShingles(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ws) - $k), i -> concat_ws(' ', slice(ws, i + 1, $k)))"))
        .as("shingle"))

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // bench side is tiny: one distinct on the shingle alone, broadcast
    val bench = wsShingles(docs.filter(col("doc_id") % BenchMod === 0), DecontShingle)
      .select(col("shingle")).distinct()
    // train side streams NARROW into the broadcast probe — no distinct, no
    // corpus shuffle; only MATCHED (doc, shingle) pairs reach the
    // aggregation, and countDistinct dedups that small survivor set
    val train = wsShingles(
      // doc_id-keyed spread: the broadcast probe preserves partitioning, so
      // the per-doc countDistinct aggregate reuses this exchange
      graft.sources.Tables.spread(
        docs.filter(col("doc_id") % BenchMod =!= 0), col("doc_id")),
      DecontShingle)
    train.join(broadcast(bench), "shingle")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"))
  }

  val decontaminateSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, doc_id % $BenchMod = 0 AS is_bench,
       |    array_to_string(w[i:i+${DecontShingle - 1}], ' ') AS shingle
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |    UNNEST(range(1, len(w) - ${DecontShingle - 2})) AS t(i)
       |  GROUP BY 1, 2, 3
       |)
       |SELECT t.doc_id, COUNT(*) AS n_shared_shingles
       |FROM (SELECT doc_id, shingle FROM sh WHERE NOT is_bench) t
       |JOIN (SELECT DISTINCT shingle FROM sh WHERE is_bench) b USING (shingle)
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_seq_pack — SEQUENCE PACKING: assign documents to fixed-token-budget
  // training sequences by cumulative token count, the batch-construction op
  // between curation and the trainer. Deterministic contiguous packing:
  // docs ordered by doc_id within a SHARD, each lands in chunk
  // floor(tokens-before / B); a shard boundary is a sequence boundary.
  //
  // Plan at 100 TB: the window partitions by (lang, shard) where shard is a
  // BOUNDED doc_id range (ShardDocs docs), so the running sum is a linear
  // pass over a bounded partition — never a per-lang (3-value!) or global
  // window funneling the corpus through a handful of tasks. One shuffle on
  // the shard key, one window pass, one hash agg; shard count grows with
  // the corpus, so parallelism does too. Packing within shards is also
  // what trainers actually consume — shard files are the unit of shuffle
  // on the training side.
  // --------------------------------------------------------------------------
  val SeqBudget = 256L
  val ShardDocs = 100L

  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        floor(col("doc_id") / ShardDocs).as("shard"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("seq_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / SeqBudget))
      .groupBy(col("lang"), col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  val seqPackSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, CAST(FLOOR(doc_id / $ShardDocs.0) AS BIGINT) AS shard,
       |    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), packed AS (
       |  SELECT doc_id, lang, shard, n_tokens,
       |    CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $SeqBudget.0) AS BIGINT) AS seq_id
       |  FROM toks
       |)
       |SELECT lang, shard, seq_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM packed GROUP BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------------------
  // q_repetition_stats — Gopher-style REPETITION signals, the quality filter
  // every pretraining pipeline runs (Rae et al. 2021 §A1.1: documents
  // dominated by one word or one n-gram are boilerplate/spam): per document,
  // the fraction of tokens claimed by the most frequent word and by the most
  // frequent bigram, plus the drop flag at the classic thresholds.
  //
  // Plan at 100 TB: two explode → two-level hash aggregations (partial
  // map-side combine on the high-cardinality (doc, gram) key, then a per-doc
  // rollup) and one equi-join of two doc-keyed aggregates. Everything is
  // keyed by doc_id or (doc_id, gram) — unique/near-unique keys, no skew,
  // linear in corpus size, no window, no driver state.
  // --------------------------------------------------------------------------
  val RepTopWordFrac = 0.20
  val RepTopBigramFrac = 0.18

  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    // doc_id-keyed spread: every aggregate here ((doc,tok), (doc,shingle),
    // per-doc rollups) and the final doc_id join cluster on doc_id — the
    // whole query runs off this single exchange
    val docs = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
    val wstats = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_word"), sum(col("c")).as("n_words"))
    val bstats = wsShingles(docs, 2)
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bigram"), sum(col("c")).as("n_bigrams"))
    wstats.join(bstats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(col("top_word").cast(DoubleType) / col("n_words"), 6)
          .as("top_word_frac"),
        round(col("top_bigram").cast(DoubleType) / col("n_bigrams"), 6)
          .as("top_bigram_frac"))
      .withColumn("repetitive",
        col("top_word_frac") > RepTopWordFrac ||
          coalesce(col("top_bigram_frac") > RepTopBigramFrac, lit(false)))
  }

  val repetitionStatsSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
       |ws AS (SELECT doc_id, MAX(c) AS top_word, SUM(c) AS n_words FROM wc GROUP BY 1),
       |bg AS (
       |  SELECT doc_id, array_to_string(wl[i:i+1], ' ') AS bgm
       |  FROM (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
       |    UNNEST(range(1, len(wl))) AS t(i)),
       |bc AS (SELECT doc_id, bgm, COUNT(*) AS c FROM bg GROUP BY 1, 2),
       |bs AS (SELECT doc_id, MAX(c) AS top_bigram, SUM(c) AS n_bigrams FROM bc GROUP BY 1),
       |fr AS (
       |  SELECT ws.doc_id,
       |    ROUND(CAST(top_word AS DOUBLE) / n_words, 6) AS top_word_frac,
       |    ROUND(CAST(top_bigram AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac
       |  FROM ws LEFT JOIN bs USING (doc_id))
       |SELECT doc_id, top_word_frac, top_bigram_frac,
       |  top_word_frac > $RepTopWordFrac
       |    OR COALESCE(top_bigram_frac > $RepTopBigramFrac, FALSE) AS repetitive
       |FROM fr""".stripMargin

  // --------------------------------------------------------------------------
  // q_domain_mix — DOMAIN-MIXTURE sampling weights: per-source doc/token
  // accounting plus the temperature-scaled sampling weight
  // w_s ∝ share_s^(1/2) (the standard sqrt/temperature reweighting that
  // up-samples small domains for pretraining mixes). Two tiny global
  // aggregates ride as broadcast one-row cross joins; the only corpus-sized
  // work is ONE hash aggregation on `source` — low-cardinality key, but
  // map-side partial combine means each task emits at most |sources| rows,
  // so the 20-key reduce never sees corpus-sized traffic.
  // --------------------------------------------------------------------------
  /** The ONE derivation of the sqrt-temperature mixture ingredients, shared
    * by q_domain_mix (which reports the weights) and q_domain_resample
    * (which materializes them as replication counts): per-source rollup →
    * broadcast total → quantized w_raw → broadcast normalizer, as columns
    * (source, n_docs, n_tokens, total_tokens, w_raw, z). */
  private def mixIngredients(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(spark, dir)
      .select(col("source"), wordCount(col("text")).as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"))
    val shares = per.join(broadcast(tot))
      .withColumn("w_raw",
        round(sqrt(col("n_tokens").cast(DoubleType) / col("total_tokens")), 6))
    val z = shares.agg(sum(col("w_raw")).as("z"))
    shares.join(broadcast(z))
  }

  /** Ditto in DuckDB: per/tot/sh/z CTEs, identical text in both oracles. */
  private val mixIngredientsCtes: String =
    """per AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per),
      |sh AS (
      |  SELECT source, n_docs, n_tokens, total_tokens,
      |    ROUND(SQRT(CAST(n_tokens AS DOUBLE) / total_tokens), 6) AS w_raw
      |  FROM per CROSS JOIN tot),
      |z AS (SELECT SUM(w_raw) AS z FROM sh)""".stripMargin

  def domainMix(spark: SparkSession, dir: String): DataFrame =
    mixIngredients(spark, dir)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast(DoubleType) / col("total_tokens"), 6)
          .as("token_share"),
        round(col("w_raw") / col("z"), 6).as("mix_weight"))

  val domainMixSql: String =
    s"""WITH $mixIngredientsCtes
       |SELECT source, n_docs, n_tokens,
       |  ROUND(CAST(n_tokens AS DOUBLE) / total_tokens, 6) AS token_share,
       |  ROUND(w_raw / z, 6) AS mix_weight
       |FROM sh CROSS JOIN z""".stripMargin

  // --------------------------------------------------------------------------
  // q_train_shuffle — deterministic GLOBAL SHUFFLE for training order: every
  // doc gets a shard (first hash byte mod ShuffleShards) and a position
  // within its shard (rank by hash). Reproducible across engines,
  // partitionings and reruns — shuffle order is a pure function of
  // (seed, doc_id), the property a resumable data loader needs.
  //
  // Plan at 100 TB: one shuffle on the shard key + a per-shard sort (the
  // window's ORDER BY). Shard count is the scale knob — a real run sizes it
  // as corpus_tokens / shard_file_budget, so per-shard sort volume stays
  // bounded as the corpus grows; 64 here is sized for the test corpus.
  // --------------------------------------------------------------------------
  val ShuffleSeed = "graft-shuffle-42:"
  val ShuffleShards = 64

  def trainShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("hx"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat(lit(ShuffleSeed), col("doc_id").cast("string"))).as("hx"))
      .withColumn("shard",
        conv(substring(col("hx"), 1, 2), 16, 10).cast(LongType) % ShuffleShards)
      .withColumn("pos", row_number().over(w).cast(LongType))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  val trainShuffleSql: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    md5(concat('$ShuffleSeed', CAST(doc_id AS VARCHAR))) AS hx
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, hx,
       |    CAST(concat('0x', substring(hx, 1, 2)) AS BIGINT) % $ShuffleShards AS shard
       |  FROM h)
       |SELECT doc_id, shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS BIGINT) AS pos
       |FROM s""".stripMargin

  // --------------------------------------------------------------------------
  // q_segment_dedup — exact SUBSTRING-level dedup at segment granularity
  // (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
  // Better": duplicated passages inside otherwise-distinct documents are
  // the dominant duplication mode in web corpora, invisible to doc-level
  // dedup). Documents split into consecutive SegWords-word segments; a
  // segment INSTANCE is a duplicate unless it is the first occurrence of
  // its content corpus-wide (first = min (doc_id, pos) — deterministic
  // survivor policy). Per document: segment count, duplicate count, and
  // the retained fraction a segment-level scrub would keep.
  //
  // Plan at 100 TB: one narrow explode (doc → segments, hashed to a
  // 32-char key so the wide text never shuffles), one hash agg per segment
  // hash for the first-occurrence owner (map-side partial combine), one
  // shuffle join of instances⋈owners on the hash (both sides keyed,
  // AQE handles hot boilerplate segments), one per-doc agg. Linear; no
  // window, no driver state, no all-pairs anything.
  // --------------------------------------------------------------------------
  val SegWords = 8

  def segmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0L, cast(ceil(size(ws) / $SegWords.0) as bigint) - 1),
           |  i -> concat_ws(' ', slice(ws, cast(i * $SegWords + 1 as int), $SegWords)))"""
          .stripMargin.replaceAll("\n", " ")))
        .as(Seq("pos", "segment")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        md5(col("segment")).as("h"))
    val owners = seg.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first_occ"))
    seg.join(owners, "h")
      .withColumn("dup",
        when(col("doc_id") === col("first_occ.doc_id") &&
          col("pos") === col("first_occ.pos"), 0L).otherwise(1L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("dup")).as("n_dup_segments"),
        round(lit(1.0) - sum(col("dup")).cast(DoubleType) / count(lit(1)), 6)
          .as("kept_frac"))
  }

  val segmentDedupSql: String =
    s"""WITH seg AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |    md5(array_to_string(wl[i * $SegWords + 1 : i * $SegWords + $SegWords], ' ')) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
       |    UNNEST(range(0, CAST(CEIL(LEN(wl) / $SegWords.0) AS BIGINT))) AS t(i)),
       |own AS (
       |  SELECT h, MIN({'doc_id': doc_id, 'pos': pos}) AS first_occ
       |  FROM seg GROUP BY 1),
       |fl AS (
       |  SELECT s.doc_id,
       |    CASE WHEN s.doc_id = w.first_occ.doc_id AND s.pos = w.first_occ.pos
       |      THEN 0 ELSE 1 END AS dup
       |  FROM seg s JOIN own w USING (h))
       |SELECT doc_id, COUNT(*) AS n_segments,
       |  CAST(SUM(dup) AS BIGINT) AS n_dup_segments,
       |  ROUND(1.0 - CAST(SUM(dup) AS DOUBLE) / COUNT(*), 6) AS kept_frac
       |FROM fl GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_gopher_rules — the Gopher quality-filter rule set (Rae et al. 2021
  // §A1.1), the canonical public pre-training document gate: word-count
  // bounds, mean-word-length bounds, and the ≥2-distinct-stopwords
  // evidence-of-real-prose rule, each surfaced as its own flag plus the
  // conjunctive keep decision (a pipeline wants per-rule accounting, not
  // just the verdict — that is how thresholds get tuned). Canonical
  // thresholds; a pure narrow projection — no shuffle at any scale.
  // --------------------------------------------------------------------------
  val GopherWordMin = 50L
  val GopherWordMax = 100000L
  val GopherMwlMin = 3.0
  val GopherMwlMax = 10.0
  val GopherStopKinds = 2L

  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        wordCount(col("text")).as("n_words"),
        round(avgWordLen(col("text")), 6).as("mean_word_len"),
        size(array_intersect(array_distinct(words(col("text"))),
          typedLit(Stopwords))).cast(LongType).as("n_stop_kinds"))
      .withColumn("pass_word_count",
        col("n_words") >= GopherWordMin && col("n_words") <= GopherWordMax)
      .withColumn("pass_word_len",
        col("mean_word_len") >= GopherMwlMin && col("mean_word_len") <= GopherMwlMax)
      .withColumn("pass_stopwords", col("n_stop_kinds") >= GopherStopKinds)
      .withColumn("keep",
        col("pass_word_count") && col("pass_word_len") && col("pass_stopwords"))

  val gopherRulesSql: String = {
    val stop = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
       |      / LEN(string_split(text, ' ')), 6) AS mean_word_len,
       |    CAST(LEN(list_intersect(list_distinct(string_split(text, ' ')),
       |      [$stop])) AS BIGINT) AS n_stop_kinds
       |  FROM documents)
       |SELECT doc_id, n_words, mean_word_len, n_stop_kinds,
       |  n_words >= $GopherWordMin AND n_words <= $GopherWordMax AS pass_word_count,
       |  mean_word_len >= $GopherMwlMin AND mean_word_len <= $GopherMwlMax AS pass_word_len,
       |  n_stop_kinds >= $GopherStopKinds AS pass_stopwords,
       |  (n_words >= $GopherWordMin AND n_words <= $GopherWordMax)
       |    AND (mean_word_len >= $GopherMwlMin AND mean_word_len <= $GopherMwlMax)
       |    AND n_stop_kinds >= $GopherStopKinds AS keep
       |FROM m""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_vocab_coverage — top-K vocabulary with cumulative token coverage, the
  // corpus statistic behind tokenizer construction and OOV budgeting. The
  // running-share window runs over exactly K rows (top-k FIRST, via a
  // distributed TakeOrdered — never a global window over the vocabulary);
  // the corpus-sized work is one hash agg on `word` with map-side partial
  // combine, and the grand total rides as a broadcast one-row cross join.
  // --------------------------------------------------------------------------
  val VocabTopK = 100

  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnts = Tables.spread(Tables.documents(spark, dir))
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val tot = cnts.agg(sum(col("cnt")).as("total"))
    val topk = cnts.orderBy(col("cnt").desc, col("word").asc).limit(VocabTopK)
    // single-partition window is SAFE here: input is the K-row limit
    // result. The constant partition key states that intent to Spark —
    // same single-partition plan, without the global-window WARN that
    // polluted every bench/verify log tail
    val w = Window.partitionBy(lit(0))
      .orderBy(col("cnt").desc, col("word").asc)
    topk.join(broadcast(tot))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .withColumn("cum_share", round(
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType) / col("total"), 6))
      .select(col("rk"), col("word"), col("cnt"), col("cum_share"))
  }

  val vocabCoverageSql: String =
    s"""WITH c AS (
       |  SELECT word, COUNT(*) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
       |tk AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT $VocabTopK)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rk,
       |  word, cnt,
       |  ROUND(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word
       |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total, 6) AS cum_share
       |FROM tk CROSS JOIN tot""".stripMargin

  // --------------------------------------------------------------------------
  // q_pii_scrub — REDACTION: rewrite each document replacing sensitive
  // spans with typed placeholder tokens and account for what was removed —
  // the pre-release scrub every published training corpus runs. Three
  // detector classes: email and IPv4 regexes (absent from this synthetic
  // corpus — the zero-match path is exercised end-to-end) and a dictionary
  // entity term ('customer' stands in for a real deny-list). The scrubbed
  // text is pinned by hash, so the oracle verifies the REWRITE itself, not
  // just the counts. Pure narrow projection; regexes are RE2-compatible so
  // both engines match spans identically.
  // --------------------------------------------------------------------------
  val PiiEmailRe = "[a-z0-9.]+@[a-z0-9.]+"
  val PiiIpv4Re = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  val PiiEntityRe = "\\bcustomer\\b"

  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), PiiEmailRe, "<EMAIL>"),
        PiiIpv4Re, "<IP>"),
      PiiEntityRe, "<ENTITY>")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      regexp_count(col("text"), lit(PiiEmailRe)).cast(LongType).as("n_email"),
      regexp_count(col("text"), lit(PiiIpv4Re)).cast(LongType).as("n_ip"),
      regexp_count(col("text"), lit(PiiEntityRe)).cast(LongType).as("n_entity"),
      md5(scrubbed).as("scrubbed_hash"))
  }

  val piiScrubSql: String =
    s"""SELECT doc_id,
       |  CAST(LEN(regexp_extract_all(text, '$PiiEmailRe')) AS BIGINT) AS n_email,
       |  CAST(LEN(regexp_extract_all(text, '$PiiIpv4Re')) AS BIGINT) AS n_ip,
       |  CAST(LEN(regexp_extract_all(text, '$PiiEntityRe')) AS BIGINT) AS n_entity,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$PiiEmailRe', '<EMAIL>', 'g'),
       |    '$PiiIpv4Re', '<IP>', 'g'),
       |    '$PiiEntityRe', '<ENTITY>', 'g')) AS scrubbed_hash
       |FROM documents""".stripMargin

  // --------------------------------------------------------------------------
  // q_dsir_weights — DSIR-style importance weights (Xie et al. 2023,
  // arXiv:2302.03169): score each document by how much its hashed-unigram
  // distribution looks like a TARGET domain (here lang='en') relative to
  // the RAW corpus. Features are hashed into DsirBuckets buckets (md5 →
  // bucket id, engine-portable), both distributions come from ONE
  // conditional aggregation pass (bounded: B rows), and the add-one-
  // smoothed probability ratio per bucket is quantized to integer MICROS
  // on the driver — so per-document scoring is a PURE NARROW pass:
  // aggregate(transform(words, w → ratioMap[bucket(w)])) — integer adds
  // inside one row, no explode, no join, no shuffle. At 100 TB the model
  // is a B-entry literal (like the IVF centroids); the corpus is scanned
  // twice (model + scoring), both embarrassingly parallel. Determinism:
  // only IEEE division/multiplication (exactly-rounded, bit-identical
  // across engines) — deliberately NO log, whose libm implementations
  // differ by ulps between engines; the ratio is a monotone surrogate for
  // DSIR's log-ratio, so ranking/resampling behavior is preserved.
  // --------------------------------------------------------------------------
  val DsirBuckets = 256
  private val DsirTargetLang = "en"

  /** md5-derived hash bucket — first 4 hex chars as int, mod B (identical
    * arithmetic to the oracle's concat('0x',…) cast). */
  private def dsirBucket(w: Column): Column =
    conv(substring(md5(w), 1, 4), 16, 10).cast(IntegerType) % DsirBuckets

  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    // doc_id-keyed spread: both the bucket-count pass and the md5-per-token
    // scoring pass otherwise run on one scan task (see lmTypicality)
    val docs = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
    // model pass: raw + target counts per bucket in one aggregation
    val counts = docs
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .select(col("lang"), dsirBucket(col("w")).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("r_cnt"),
        count(when(col("lang") === DsirTargetLang, 1)).as("t_cnt"))
      .collect()
      .map(r => r.getAs[Int]("b") -> (r.getAs[Long]("r_cnt"), r.getAs[Long]("t_cnt")))
      .toMap
    val rTotal = counts.valuesIterator.map(_._1).sum
    val tTotal = counts.valuesIterator.map(_._2).sum
    val qRatio: Map[Int, Long] = (0 until DsirBuckets).map { b =>
      val (r, t) = counts.getOrElse(b, (0L, 0L))
      val num = (t + 1.0) / (tTotal + DsirBuckets)
      val den = (r + 1.0) / (rTotal + DsirBuckets)
      b -> math.round(num / den * 1000000.0)
    }.toMap
    // scoring pass: narrow — per-row integer fold over the token array
    val toks = words(col("text"))
    docs
      .select(col("doc_id"), toks.as("toks"), size(toks).as("n"))
      .filter(col("n") > 0)
      .select(
        col("doc_id"),
        col("n").cast(LongType).as("n_tok"),
        (aggregate(
          transform(col("toks"), w => element_at(typedLit(qRatio), dsirBucket(w))),
          lit(0L), (acc, x) => acc + x).cast(DoubleType)
          / 1000000.0 / col("n").cast(DoubleType)).as("dsir_weight"))
  }

  val dsirWeightsSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, lang,
       |    CAST(concat('0x', substr(md5(u.w), 1, 4)) AS INTEGER) % $DsirBuckets AS b
       |  FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS w) u),
       |cnt AS (
       |  SELECT b, COUNT(*) AS r_cnt,
       |    COUNT(*) FILTER (WHERE lang = '$DsirTargetLang') AS t_cnt
       |  FROM w GROUP BY b),
       |tot AS (SELECT SUM(r_cnt) AS rt, SUM(t_cnt) AS tt FROM cnt),
       |q AS (
       |  SELECT g.range AS b,
       |    CAST(ROUND(((COALESCE(t_cnt, 0) + 1.0) / (tt + $DsirBuckets))
       |      / ((COALESCE(r_cnt, 0) + 1.0) / (rt + $DsirBuckets))
       |      * 1000000.0) AS BIGINT) AS q
       |  FROM range(0, $DsirBuckets) g
       |  LEFT JOIN cnt ON cnt.b = g.range CROSS JOIN tot),
       |s AS (
       |  SELECT w.doc_id, SUM(q.q) AS s, COUNT(*) AS n
       |  FROM w JOIN q USING (b) GROUP BY w.doc_id)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
       |  CAST(s AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE) AS dsir_weight
       |FROM s WHERE n > 0""".stripMargin

  // --------------------------------------------------------------------------
  // q_lm_typicality — CCNet-style reference-LM scoring (Wenzek et al. 2020,
  // arXiv:1911.00359): build a character-trigram LM from the target-domain
  // subset (lang='en'), score every document by its mean conditional
  // trigram likelihood p(c₃|c₁c₂) = c3(tri)/c2(prefix), plus its
  // out-of-model trigram count. The model is bounded by charset³ (377
  // distinct trigrams here; bounded at any corpus size), so it BROADCASTS;
  // scoring is explode → broadcast-left-join → per-doc partial-aggregated
  // sum (1 row/doc leaves each map task). Probabilities are quantized to
  // integer micros before summation — order-independent exact adds — and
  // use division only (no log), bit-identical across engines; the mean
  // likelihood ranks documents the same way CCNet's perplexity does, low =
  // atypical of the reference domain.
  // --------------------------------------------------------------------------
  def lmTypicality(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread: bench-methodology A/B across four runs read the keyed
    // fan-out 1.2-1.7x SLOWER here — the trigram-code explode is cheap
    // enough per row that the extra exchange stage never pays for itself
    val docs = Tables.documents(spark, dir)
    // trigrams ride as packed long codes from the codegen'd
    // CharTrigramCodes expression (injective over CODE POINTS, so equal to
    // the oracle's substr char trigrams on ANY text, multi-byte UTF-8
    // included — the substring formulation allocated a UTF8String per
    // position and joined on string keys; this one emits a primitive array
    // and joins on longs). Short strings yield an empty array, so the
    // explode drops them exactly like the oracle's length >= 3 guard.
    def triExplode(df: DataFrame, extra: Column*): DataFrame =
      df.select(extra :+
        explode(graft.functions.CharTrigramCodes(col("text"))).as("tri"): _*)
    // c3 feeds BOTH sides of the model join (c2 derives from it) — cache
    // the charset³-bounded aggregate so the target corpus is scanned once,
    // not twice. Cache lifetime: the returned frame references it, so the
    // release is the harness's post-materialize clearCache() (Bench/Verify)
    val c3 = triExplode(docs.filter(col("lang") === DsirTargetLang))
      .groupBy(col("tri")).agg(count(lit(1)).as("c"))
      .cache()
    // prefix of the code = its high two code points (substring(tri,1,2) ≡
    // tri>>21: drop the 21-bit last code point)
    val c2 = c3.groupBy(shiftright(col("tri"), 21).as("pre"))
      .agg(sum(col("c")).as("s"))
    val model = c3.join(c2, shiftright(col("tri"), 21) === col("pre"))
      .select(col("tri"),
        round(col("c").cast(DoubleType) / col("s").cast(DoubleType) * 1000000.0)
          .cast(LongType).as("q"))
    triExplode(docs, col("doc_id"))
      .join(broadcast(model), Seq("tri"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tri"),
        count(when(col("q").isNull, 1)).as("n_unseen"),
        sum(coalesce(col("q"), lit(0L))).as("s"))
      .select(col("doc_id"), col("n_tri"), col("n_unseen"),
        (col("s").cast(DoubleType) / 1000000.0 / col("n_tri").cast(DoubleType))
          .as("typicality"))
  }

  val lmTypicalitySql: String =
    s"""WITH tri_t AS (
       |  SELECT substr(text, CAST(u.i AS INTEGER), 3) AS tri
       |  FROM documents, LATERAL (SELECT unnest(range(1, length(text) - 1)) AS i) u
       |  WHERE lang = '$DsirTargetLang' AND length(text) >= 3),
       |c3 AS (SELECT tri, COUNT(*) AS c FROM tri_t GROUP BY tri),
       |c2 AS (SELECT substr(tri, 1, 2) AS pre, SUM(c) AS s FROM c3 GROUP BY 1),
       |q AS (
       |  SELECT tri,
       |    CAST(ROUND(CAST(c AS DOUBLE) / CAST(s AS DOUBLE) * 1000000.0) AS BIGINT) AS q
       |  FROM c3 JOIN c2 ON substr(c3.tri, 1, 2) = c2.pre),
       |alltri AS (
       |  SELECT doc_id, substr(text, CAST(u.i AS INTEGER), 3) AS tri
       |  FROM documents, LATERAL (SELECT unnest(range(1, length(text) - 1)) AS i) u
       |  WHERE length(text) >= 3),
       |agg AS (
       |  SELECT a.doc_id, COUNT(*) AS n_tri,
       |    COUNT(*) FILTER (WHERE q.q IS NULL) AS n_unseen,
       |    SUM(COALESCE(q.q, 0)) AS s
       |  FROM alltri a LEFT JOIN q ON a.tri = q.tri
       |  GROUP BY a.doc_id)
       |SELECT doc_id, n_tri, n_unseen,
       |  CAST(s AS DOUBLE) / 1000000.0 / CAST(n_tri AS DOUBLE) AS typicality
       |FROM agg""".stripMargin

  // --------------------------------------------------------------------------
  // q_doc_chunks — sliding token-window chunking, the RAG/embedding-
  // ingestion primitive: each document becomes ⌈n_tok/stride⌉ overlapping
  // chunks of up to ChunkTokens tokens, each carrying its token offset (so
  // a retrieval hit can be located in the source) and content hash (so
  // chunk-level dedup/caching can key on it). Entirely NARROW: split →
  // per-row start sequence → one Generate (explode) → project; no shuffle
  // at any scale, output partitioning inherits the scan. Chunk counts are a
  // pure function of token count — no cross-document state — so the
  // operator parallelizes embarrassingly at 100 TB.
  // --------------------------------------------------------------------------
  val ChunkTokens = 16
  val ChunkStride = 12 // 4-token overlap between consecutive chunks

  def docChunks(spark: SparkSession, dir: String): DataFrame = {
    val toks = words(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"), size(toks).as("n"))
      .filter(col("n") > 0)
      // chunk k covers tokens [k·stride, k·stride + ChunkTokens); starts
      // enumerate while start < n so every token lands in ≥1 chunk
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0), col("n") - 1, lit(ChunkStride)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("start_tok").cast(LongType).as("start_tok"),
        least(lit(ChunkTokens), col("n") - col("start_tok"))
          .cast(LongType).as("n_tok"),
        md5(concat_ws(" ",
          slice(col("toks"), col("start_tok") + 1, lit(ChunkTokens))))
          .as("chunk_hash"))
  }

  val docChunksSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    LEN(string_split(text, ' ')) AS n
       |  FROM documents WHERE LEN(string_split(text, ' ')) > 0),
       |c AS (
       |  SELECT doc_id, toks, n, CAST(s.start AS INTEGER) AS start_tok,
       |    CAST(s.start // $ChunkStride AS INTEGER) AS chunk_idx
       |  FROM d, LATERAL (SELECT unnest(range(0, n, $ChunkStride)) AS start) s)
       |SELECT doc_id, chunk_idx, CAST(start_tok AS BIGINT) AS start_tok,
       |  CAST(LEAST($ChunkTokens, n - start_tok) AS BIGINT) AS n_tok,
       |  md5(array_to_string(
       |    list_slice(toks, start_tok + 1, start_tok + $ChunkTokens), ' ')) AS chunk_hash
       |FROM c""".stripMargin

  // --------------------------------------------------------------------------
  // q_bm25 — BM25 ranked retrieval (Robertson & Walker 1994; the Okapi
  // k1/b form): top-K documents per query for a fixed query set, the
  // retrieval primitive behind eval-set decontamination sweeps, RAG index
  // sanity checks, and targeted corpus audits. Scoring is exact BM25 with
  // idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term contributions are
  // quantized to integer micros before summation (order-independent exact
  // adds — the cross-engine determinism pattern every sketch/LM query here
  // uses), so the score is bit-identical in Spark and DuckDB.
  //
  // Plan at 100 TB: the query set is tiny and BROADCASTS; the corpus-side
  // work is one narrow pass that filters each doc's token array to query
  // terms BEFORE exploding (non-matching tokens never leave the map task),
  // one (doc_id, term)-keyed hash agg with map-side combine, and a
  // term-keyed df aggregate bounded by |query vocabulary|. Top-K is
  // TWO-PHASE: rank within (query_id, salt) first — 32-way parallel, each
  // emits ≤ K — then rank the ≤ 32·K survivors per query; the global
  // top-K is provably inside the salted top-Ks, and no per-query window
  // ever funnels the corpus through |queries| tasks.
  // --------------------------------------------------------------------------
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 10
  val Bm25Salt = 32L
  /** Fixed query set: (query_id, terms). */
  val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("hash", "join", "merge"),
    1 -> Seq("stream", "window", "batch"),
    2 -> Seq("vector", "scan", "filter"))

  def bm25(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val allTerms = Bm25Queries.flatMap(_._2).distinct
    val termList = allTerms.map(t => s"'$t'").mkString(", ")
    val qterms = Bm25Queries
      .flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query_id", "term")
    // doc_id-keyed spread: the (doc_id, dl, term) tf aggregate and the
    // (query_id, doc_id) score rollup cluster on doc_id (broadcast joins in
    // between preserve partitioning), so both reuse this one exchange
    val docs = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        col("toks"))
    // one-row global stats ride as a broadcast cross join
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = docs
      .select(col("doc_id"), col("dl"),
        explode(expr(s"filter(toks, t -> t IN ($termList))")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = df_.join(broadcast(stats))
      .select(col("term"),
        // idf quantized to micros ONCE per term: ln is the only non-IEEE-
        // mandated op in the score; confining it to one rounding per term
        // keeps the summed contributions engine-exact
        round(log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) * 1e6).cast(LongType).as("idf_micro"),
        (col("sum_dl").cast(DoubleType) / col("n_docs")).as("avgdl"))
    val contrib = tf.join(broadcast(idf), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        round(col("idf_micro") * (col("tf") * lit(Bm25K1 + 1.0) /
          (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) +
            lit(Bm25B) * col("dl") / col("avgdl")))))
          .cast(LongType).as("c_micro"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c_micro")).as("s_micro"))
    // two-phase exact top-K (see header): salted local rank, then final
    val local = scored
      .withColumn("salt", col("doc_id") % Bm25Salt)
      .withColumn("r", row_number().over(Window
        .partitionBy(col("query_id"), col("salt"))
        .orderBy(col("s_micro").desc, col("doc_id").asc)))
      .filter(col("r") <= Bm25TopK).drop("r", "salt")
    local
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("s_micro").desc, col("doc_id").asc)).cast(LongType))
      .filter(col("rank") <= Bm25TopK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("s_micro").cast(DoubleType) / 1e6, 6).as("score"))
  }

  val bm25Sql: String = {
    val allTerms = Bm25Queries.flatMap(_._2).distinct
    val termList = allTerms.map(t => s"'$t'").mkString(", ")
    val qvals = Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS dl,
       |    string_split(text, ' ') AS toks
       |  FROM documents),
       |st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM d),
       |tf AS (
       |  SELECT doc_id, dl, t.term, CAST(COUNT(*) AS DOUBLE) AS tf
       |  FROM d, UNNEST(list_filter(toks, x -> x IN ($termList))) AS t(term)
       |  GROUP BY 1, 2, 3),
       |dfp AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |idf AS (
       |  SELECT term,
       |    CAST(ROUND(LN(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * 1000000.0)
       |      AS BIGINT) AS idf_micro,
       |    CAST(sum_dl AS DOUBLE) / n_docs AS avgdl
       |  FROM dfp CROSS JOIN st),
       |qt(query_id, term) AS (VALUES $qvals),
       |contrib AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(ROUND(i.idf_micro * (tf.tf * (${Bm25K1} + 1.0) /
       |      (tf.tf + ${Bm25K1} * (1.0 - ${Bm25B} + ${Bm25B} * tf.dl / i.avgdl))))
       |      AS BIGINT) AS c_micro
       |  FROM tf JOIN idf i USING (term) JOIN qt USING (term)),
       |scored AS (
       |  SELECT query_id, doc_id, CAST(SUM(c_micro) AS BIGINT) AS s_micro
       |  FROM contrib GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id,
       |  ROUND(CAST(s_micro AS DOUBLE) / 1000000.0, 6) AS score
       |FROM (
       |  SELECT query_id, doc_id, s_micro,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY s_micro DESC, doc_id ASC) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $Bm25TopK""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q_domain_resample — MATERIALIZE the temperature mixture that
  // q_domain_mix only weights: per document, the integer replication count
  // ("epochs") that makes each source's post-resample token share equal its
  // mix weight. factor_s = mix_weight_s · total_tokens / tokens_s; each doc
  // gets ⌊factor⌋ copies plus one more iff its deterministic hash-fraction
  // u(doc_id) < frac(factor) — so expected replication equals the factor
  // exactly, reproducibly across engines, partitionings and reruns (the
  // same pure-function-of-(seed, doc_id) property as q_train_shuffle).
  //
  // Plan at 100 TB: the per-source factor table is |sources|-sized and
  // BROADCASTS; the per-doc pass is narrow (md5 + arithmetic, no shuffle).
  // The only corpus-sized aggregation is the same single low-cardinality
  // source rollup q_domain_mix runs.
  // --------------------------------------------------------------------------
  val ResampleSeed = "graft-resample-7:"

  def domainResample(spark: SparkSession, dir: String): DataFrame = {
    val factors = mixIngredients(spark, dir)
      .select(col("source"),
        // quantize the factor BEFORE floor/frac so the branch never sits on
        // an engine-dependent ulp boundary
        round(col("w_raw") / col("z") * col("total_tokens")
          / col("n_tokens"), 6).as("factor"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(broadcast(factors), Seq("source"))
      .withColumn("u",
        round(conv(substring(md5(concat(lit(ResampleSeed),
          col("doc_id").cast("string"))), 1, 6), 16, 10).cast(DoubleType)
          / 16777216.0, 6))
      .select(col("doc_id"), col("source"), col("factor"),
        (floor(col("factor")) +
          when(col("u") < round(col("factor") - floor(col("factor")), 6), 1L)
            .otherwise(0L)).cast(LongType).as("n_copies"))
  }

  val domainResampleSql: String =
    s"""WITH $mixIngredientsCtes,
       |f AS (
       |  SELECT source,
       |    ROUND(w_raw / z * total_tokens / n_tokens, 6) AS factor
       |  FROM sh CROSS JOIN z)
       |SELECT d.doc_id, d.source, f.factor,
       |  CAST(FLOOR(f.factor) +
       |    CASE WHEN ROUND(CAST(concat('0x', substring(md5(concat(
       |        '$ResampleSeed', CAST(d.doc_id AS VARCHAR))), 1, 6)) AS BIGINT)
       |        / 16777216.0, 6)
       |      < ROUND(f.factor - FLOOR(f.factor), 6) THEN 1 ELSE 0 END
       |    AS BIGINT) AS n_copies
       |FROM documents d JOIN f USING (source)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25"            -> (bm25 _),
    "q_domain_resample" -> (domainResample _),
    "q_dsir_weights"    -> (dsirWeights _),
    "q_lm_typicality"   -> (lmTypicality _),
    "q_doc_chunks"      -> (docChunks _),
    "q_stratified_sample" -> (stratifiedSample _),
    "q_curation_funnel" -> (curationFunnel _),
    "q_tfidf"           -> (tfidf _),
    "q_dedup_exact"     -> (dedupExact _),
    "q_text_quality"    -> (textQuality _),
    "q_token_count"     -> (tokenCount _),
    "q_lang_id"         -> (langId _),
    "q_doc_fingerprint" -> (docFingerprint _),
    "q_decontaminate"   -> (decontaminate _),
    "q_seq_pack"        -> (seqPack _),
    "q_repetition_stats" -> (repetitionStats _),
    "q_domain_mix"      -> (domainMix _),
    "q_train_shuffle"   -> (trainShuffle _),
    "q_segment_dedup"   -> (segmentDedup _),
    "q_gopher_rules"    -> (gopherRules _),
    "q_vocab_coverage"  -> (vocabCoverage _),
    "q_pii_scrub"       -> (piiScrub _),
  )

  val oracles: Map[String, String] = Map(
    "q_bm25"            -> bm25Sql,
    "q_domain_resample" -> domainResampleSql,
    "q_dsir_weights"    -> dsirWeightsSql,
    "q_lm_typicality"   -> lmTypicalitySql,
    "q_doc_chunks"      -> docChunksSql,
    "q_stratified_sample" -> stratifiedSampleSql,
    "q_curation_funnel" -> curationFunnelSql,
    "q_tfidf"           -> tfidfSql,
    "q_dedup_exact"     -> dedupExactSql,
    "q_text_quality"    -> textQualitySql,
    "q_token_count"     -> tokenCountSql,
    "q_lang_id"         -> langIdSql,
    "q_doc_fingerprint" -> docFingerprintSql,
    "q_decontaminate"   -> decontaminateSql,
    "q_seq_pack"        -> seqPackSql,
    "q_repetition_stats" -> repetitionStatsSql,
    "q_domain_mix"      -> domainMixSql,
    "q_train_shuffle"   -> trainShuffleSql,
    "q_segment_dedup"   -> segmentDedupSql,
    "q_gopher_rules"    -> gopherRulesSql,
    "q_vocab_coverage"  -> vocabCoverageSql,
    "q_pii_scrub"       -> piiScrubSql,
  )
}
