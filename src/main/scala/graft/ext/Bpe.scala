package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== Merge-based subword tokenizer (BPE apply), from scratch ====
  *
  * The tokenization step every LLM data pipeline runs: spell text into
  * symbols, then apply a FIXED, priority-ordered merge table — the
  * byte-pair-encoding apply phase. The repo's `token_counts` key covers
  * regex word-splitting; this operator is the real merge machinery:
  *
  *  - spelling: the text's SPACES become the '▁' word-boundary marker
  *    (the SentencePiece convention), then the string is split into
  *    individual CODEPOINTS joined by ' ' — the working separator;
  *  - merge application: for each rule `(a, b)` in priority order, one
  *    global left-to-right non-overlapping pass replaces `"a b"` with
  *    `"ab"`. This pass semantics is chosen deliberately: it is EXACTLY
  *    what both `java.lang.String.replace` and DuckDB's `replace()`
  *    implement, so the oracle replays the entire tokenizer as a 40-deep
  *    nested `replace()` chain and the result is bitwise-comparable.
  *    (Real BPE libraries merge rank-by-rank within words — on text
  *    whose words contain each pair at most once, the two are identical;
  *    the divergence on degenerate repeats like "aaaa" is documented
  *    here rather than hidden.)
  *
  * Codepoint discipline matters: Scala iterates UTF-16 chars by default
  * while DuckDB's substr/length count codepoints, so the speller walks
  * `codePoints()` — an astral emoji is ONE symbol on both engines.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * tokenizer; north-star LLM-pipeline scope. 100 TB shape: map-only,
  * single pass, the merge table is a per-executor constant.
  */
object Bpe {

  /** Priority-ordered merge table (highest first), an English-frequency
    * flavored fixture shared verbatim by the DuckDB oracle builder.
    */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("t", "i"), ("a", "l"), ("an", "d"), ("o", "u"),
    ("a", "r"), ("s", "t"), ("in", "g"), ("o", "f"), ("i", "s"),
    ("i", "t"), ("e", "d"), ("the", "▁"), ("and", "▁"), ("s", "▁"),
    ("e", "▁"), ("d", "▁"), ("t", "▁"), ("y", "▁"), ("o", "▁"),
    ("▁", "the"), ("▁", "a"), ("▁", "w"), ("▁", "s"), ("▁", "b"),
    ("c", "h"), ("s", "h"), ("w", "h"), ("q", "u"), ("l", "l"))

  /** Spell a text into space-joined codepoint symbols with '▁' word
    * boundaries.
    */
  private[ext] def spell(text: String): String = {
    val marked = text.replace(' ', '▁')
    val sb = new StringBuilder(marked.length * 2)
    val it = marked.codePoints().iterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append(' ')
      sb.appendAll(Character.toChars(it.next()))
      first = false
    }
    sb.toString
  }

  /** One left-to-right non-overlapping pass per merge rule, in priority
    * order — `String.replace` semantics on both engines.
    */
  private[ext] def applyMerges(spelled: String): String =
    Merges.foldLeft(spelled) { case (s, (a, b)) => s.replace(a + " " + b, a + b) }

  private[ext] def tokenize(text: String): Array[String] = {
    if (text.isEmpty) Array.empty
    else applyMerges(spell(text)).split(' ')
  }

  final case class BpeStats(doc_id: Long, n_chars: Long, n_tokens: Long, checksum: Long)

  /** Per-document subword statistics: codepoint count, merged token
    * count, and the base-31 checksum over the merged symbol stream
    * (UTF-8 bytes of the space-joined tokens) — one drifted merge
    * anywhere in a document changes the stream and fails the hash.
    */
  def bpeStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Dataset[BpeStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val merged = if (text.isEmpty) "" else applyMerges(spell(text))
        val nTokens = if (text.isEmpty) 0L else merged.count(_ == ' ') + 1L
        var c = 0L
        merged.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
        BpeStats(id, text.codePointCount(0, text.length).toLong, nTokens, c)
      }
  }

  /** The DuckDB expression tree for the same tokenizer, built from the
    * SAME merge table so the two engines cannot drift: spell via
    * substr-per-codepoint, then the nested replace() chain.
    */
  private[graft] def oracleMergedExpr(textCol: String): String = {
    val spelled =
      s"array_to_string(list_transform(range(length(replace($textCol, ' ', '▁'))), " +
        s"i -> substr(replace($textCol, ' ', '▁'), CAST(i + 1 AS INT), 1)), ' ')"
    Merges.foldLeft(spelled) { case (acc, (a, b)) =>
      val from = (a + " " + b).replace("'", "''")
      val to = (a + b).replace("'", "''")
      s"replace($acc, '$from', '$to')"
    }
  }
}
