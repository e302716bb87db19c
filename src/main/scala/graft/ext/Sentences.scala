package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== sentence segmentation ========
  *
  * The unit under document level: sentence-level dedup, quality
  * filtering, and parallel-corpus alignment all run on SENTENCES, and
  * getting them out of prose is a rule system, not a split on periods.
  * The classical rule set (Punkt's deterministic core / the spaCy
  * sentencizer's): a boundary is
  *
  *   terminator run `[.!?]+` + optional closing quote + whitespace +
  *   an upper-case letter or digit,
  *
  * EXCEPT when the token immediately before the terminator is a known
  * abbreviation (`Dr.`, `Mr.`, `vs.`, `etc.` …) — the guard that keeps
  * honorifics from splitting. The two classic false positives are
  * covered structurally: decimals (`3.14`) never match because no
  * whitespace follows the dot, and ellipses trailing into lower case
  * (`wait... then`) never match because the next letter isn't upper.
  * The final sentence closes at end-of-text with no look-ahead needed.
  *
  * Each emitted sentence is the exact source span (terminator and
  * closing quote included, edges trimmed); the per-sentence checksum
  * covers its bytes, so the oracle grades exact spans, not counts.
  * Map-only per document, zero shuffles — at 100 TB this runs inside
  * the text-curation map next to quality scoring, and its output is
  * what sentence-level dedup shuffles on.
  *
  * No reference citation — north-star scope in the text family.
  */
object Sentences {

  private val abbreviations = Set("dr", "mr", "mrs", "ms", "vs", "etc", "fig", "st", "no")

  /** Split `text` into sentences by the rule set above. */
  private[ext] def split(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val n = text.length
    var start = 0
    var i = 0
    def isTerm(c: Char) = c == '.' || c == '!' || c == '?'
    while (i < n) {
      if (isTerm(text.charAt(i))) {
        var j = i
        while (j + 1 < n && isTerm(text.charAt(j + 1))) j += 1 // terminator run
        var k = j + 1
        if (k < n && text.charAt(k) == '"') k += 1 // closing quote rides along
        // boundary needs whitespace then an upper/digit opener
        var w = k
        while (w < n && Character.isWhitespace(text.charAt(w))) w += 1
        val opens = w > k && w < n &&
          (Character.isUpperCase(text.charAt(w)) || Character.isDigit(text.charAt(w)))
        if (opens) {
          // abbreviation guard: letters immediately before the run
          var a = i - 1
          while (a >= start && Character.isLetter(text.charAt(a))) a -= 1
          val token = text.substring(a + 1, i).toLowerCase
          if (!abbreviations.contains(token)) {
            val s = text.substring(start, k).trim
            if (s.nonEmpty) out += s
            start = w
          }
        }
        i = k
      } else i += 1
    }
    val tail = text.substring(start).trim
    if (tail.nonEmpty) out += tail
    out.result()
  }

  // ------------------------------------------------------------- fixture

  private val words = Array("alpha", "breeze", "copper", "drift", "ember", "frost", "glint", "haze")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The closed-form sentence plane: doc `id` carries `2 + nib(1)%3`
    * sentences; sentence j cycles four hazard arms by `(id+j)%4` —
    * plain with a `.`/`!` terminator, an honorific (`Dr. Capword`) the
    * guard must hold, an ellipsis trailing into lower case, and a
    * quoted mid-sentence `?"` followed by lower case. Joined with one
    * space; every arm's naive split differs from the ruled one.
    */
  private[ext] def sentencesFor(id: Long): Seq[String] = {
    val m = md5Hex(s"ss:$id")
    def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
    def w(i: Int) = words(nib(i) % 8)
    val ns = 2 + nib(1) % 3
    (0 until ns).map { j =>
      val wa = words(nib(2 + j) % 8)
      val wb = words(nib(6 + j) % 8)
      val cap = wb.substring(0, 1).toUpperCase + wb.substring(1)
      ((id + j) % 4) match {
        case 0 =>
          val term = if ((id + j) % 8 < 4) "." else "!"
          s"Sentence $j of doc $id mentions $wa plus $wb$term"
        case 1 => s"Sentence $j of doc $id cites Dr. $cap on $wa."
        // arm 2 carries NO doc id on purpose: 64 possible strings across
        // the corpus, so cross-doc duplicates occur — the plane
        // sentence-level dedup (sentence_dedup) collapses
        case 2 => s"Ellipsis drifts off... then $wa resumes near $wb."
        case _ => s"""Sentence $j of doc $id asked "$wa?" and kept going."""
      }
    }
  }

  def encodeProse(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      .as[Long]
      .map(id => (id, sentencesFor(id).mkString(" ")))
      .toDF("doc_id", "prose")
  }

  final case class Sentence(doc_id: Long, sent_idx: Long, n_chars: Long, checksum: Long)

  /** The operator: prose → the sentence table; map-only. */
  def sentenceSplit(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "prose"): Dataset[Sentence] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Nil
        else split(text).zipWithIndex.map { case (s, j) =>
          val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var c = 0L
          bytes.foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
          Sentence(id, j.toLong, bytes.length.toLong, c)
        }
      }
  }
}
