package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for training-data curation (north star, SURVEY
  * §7.6): quality scoring, language ID, token counting, fingerprinting. Pure
  * column expressions — whole-stage codegen, no UDFs, linear single-pass.
  */
object TextAnalysis {

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

  /** Per-document quality features: lengths + character-class and lexical ratios. */
  def quality(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("toks", tokens(t))
      .select(
        col(idCol),
        length(t).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        charClassRatio(t, "a-zA-Z").as("alpha_ratio"),
        charClassRatio(t, ".,;:!?").as("punct_ratio"),
        stopwordRatio(col("toks"), defaultStopwords).as("stopword_ratio"),
        distinctRatio(col("toks")).as("distinct_ratio"))
  }

  /** Marker-lexicon language ID: per-language marker-token counts + argmax
    * (ties broken in lexicon order en > de > fr > es).
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = docs
      .withColumn("toks", tokens(col(textCol)))
      .select(
        col(idCol) +: langMarkers.map { case (lang, markers) =>
          markerScore(col("toks"), markers).as(s"score_$lang")
        }: _*)
    val langs = langMarkers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) { case ((lang, i), rest) =>
      val beatsAllLater = langs.drop(i + 1).map(l2 => col(s"score_$lang") >= col(s"score_$l2")).reduce(_ && _)
      when(beatsAllLater, lang).otherwise(rest)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Whitespace token count + BPE-ish subword count (alpha runs / digit runs
    * / single symbols).
    */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("ws_tokens"),
      bpeishTokenCount(col(textCol)).as("bpe_tokens"))

  /** Corpus vocabulary: the `topK` most frequent whitespace tokens of the
    * normalized text, ties broken lexicographically (total order -> the
    * LIMIT boundary is deterministic and oracle-checkable). Plan shape:
    * explode -> partial-aggregated count -> `TakeOrderedAndProject` — the
    * only full shuffle carries one row per distinct token, and the top-k is
    * a per-partition heap + driver merge, never a global sort.
    */
  def vocabulary(docs: DataFrame, topK: Int = 100, textCol: String = "text"): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topK)

  /** Content fingerprints: MD5 of normalized text plus a polynomial rolling
    * hash (base-31 over code points, mod 1e9+7 — a native codegen'd
    * [[graft.functions.TextExpressions.RollingHash]] expression; the
    * previous `aggregate(split(text, ""), ...)` form evaluated an
    * interpreted lambda once per character). The modulus keeps the
    * accumulator well inside int64 so the hash is engine-portable
    * (unchecked int64 wraparound is engine-specific).
    */
  val rollingHashMod = 1000000007L

  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.functions.TextExpressions.RollingHash
    val rolling = ColumnBridge.column(
      RollingHash(ColumnBridge.expression(normText(col(textCol))), 31L, rollingHashMod))
    docs.select(
      col(idCol),
      fingerprint(col(textCol)).as("fingerprint"),
      rolling.as("rolling_hash"))
  }
}
