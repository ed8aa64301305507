package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis building blocks for the training-data pipeline operators.
  * All are `Column => Column` compositions of codegen'd built-ins — no UDFs
  * (SURVEY.md §2.9: expression-composition functions, zero serialization
  * cost, fully Catalyst-optimizable).
  */
object TextFunctions {

  /** Whitespace tokens (single-space split, reference-style; empty string
    * still yields one empty token — callers guard on n_chars > 0). */
  def words(text: Column): Column = split(text, " ")

  def wordCount(text: Column): Column = size(words(text)).cast(LongType)

  /** Characters excluding the single-space separators. */
  def letterCount(text: Column): Column =
    length(translate(text, " ", "")).cast(LongType)

  def avgWordLen(text: Column): Column =
    letterCount(text).cast(DoubleType) / wordCount(text)

  /** English-ish stopwords present in the harness corpus vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  def stopwordCount(text: Column): Column =
    size(filter(words(text), w => w.isInCollection(Stopwords))).cast(LongType)

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast(DoubleType) / wordCount(text)

  def distinctWordCount(text: Column): Column =
    size(array_distinct(words(text))).cast(LongType)

  /** Type-token ratio — lexical diversity, a standard quality signal. */
  def typeTokenRatio(text: Column): Column =
    distinctWordCount(text).cast(DoubleType) / wordCount(text)

  /** Composite quality score in [0,1]: half lexical diversity, half a length
    * saturation term (caps at 100 words). Deterministic double arithmetic —
    * oracle-reproducible. */
  def qualityScore(text: Column): Column =
    typeTokenRatio(text) * 0.5 +
      least(wordCount(text).cast(DoubleType) / lit(100.0), lit(1.0)) * 0.5

  /** Order-insensitive bag-of-words fingerprint (document dedup key that is
    * robust to word reordering — the rolling-hash fingerprint analogue). */
  def bowFingerprint(text: Column): Column =
    md5(array_join(sort_array(words(text)), " "))
}
