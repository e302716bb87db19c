package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the large-scale training-data pipeline
  * operators (north star, SURVEY §7.6): normalization, tokenization, n-grams,
  * quality ratios, marker-based language scoring, fingerprinting. All built
  * from codegen'd built-ins — no UDFs.
  */
object TextFunctions {

  /** Canonical normalization: lowercase, collapse whitespace runs, trim. */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "[ \\t\\n\\f\\r]+", " ")))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normText(text), " ")

  /** Word n-grams (array of space-joined windows) over a token array column. */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 1)
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array())
  }

  /** xxhash64 word-n-gram hashes of a token array in one native kernel —
    * bitwise `xxhash64(concat_ws(" ", window))` per window without the
    * interpreted per-gram lambda of the [[wordNgrams]] + `xxhash64` chain.
    */
  def ngramHashes(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NgramExpressions.NgramHashes(
        org.apache.spark.sql.graft.ColumnBridge.expression(toks), n))

  /** MD5 fingerprint of the normalized text (content-defined exact-dup key). */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** num/den with a zero-denominator guard (empty docs would otherwise yield
    * null/NaN rows that no oracle reproduces).
    */
  private def safeRatio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den).otherwise(lit(0.0))

  /** Fraction of characters in `cls` (a regex character class); 0.0 on empty. */
  def charClassRatio(text: Column, cls: String): Column =
    safeRatio(length(regexp_replace(text, s"[^$cls]", "")), length(text))

  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column =
    safeRatio(size(filter(toks, t => t.isInCollection(stopwords))), size(toks))

  def distinctRatio(toks: Column): Column =
    safeRatio(size(array_distinct(toks)), size(toks))

  /** Count of tokens present in a marker-word list (language-ID scoring). */
  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers))).cast("long")

  /** BPE-ish subword count: alpha runs, digit runs, and single symbols. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]")).cast("long")

  /** Language marker lexicons (tiny, deterministic; n-gram-free heuristic). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a", "in", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "en"))
}
