package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== HTML text extraction ========
  *
  * The first real step of every crawl-derived training corpus: strip
  * markup, decode entities, drop script/style/comment content — at 100
  * TB this runs on every fetched page, so it must be a single-pass
  * state machine (no regex backtracking, no DOM allocation) and
  * map-only (zero shuffles).
  *
  * The machine: TEXT (entities decoded: the named core set + decimal
  * and hex numeric references incl. astral code points via surrogate
  * pairs; invalid or unterminated references pass through literally),
  * TAG (single- and double-quoted attribute values may contain '>'
  * without closing the tag), COMMENT (ends only at `-->`), and RAWTEXT
  * for script/style (ends only at the matching case-insensitive close
  * tag — entities and '<' inside are content, never markup).
  *
  * The writer half exists to put the extractor under a bitwise gate: it
  * escapes the document text (mandatory `&<>` plus deterministic
  * numeric references over ASCII alphanumerics) and splices hostile
  * markup between characters — quoted-'>' attributes, comment decoys,
  * script/style blocks with tag-shaped string content, mismatched-case
  * tags — such that exact extraction recovers EXACTLY the original
  * text, which the oracle recomputes stats from directly.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * HTML path; north-star crawl-ingestion scope.
  */
object Html {

  // ------------------------------------------------------------- writer

  /** Hostile markup snippets: each contributes ZERO extracted text. */
  private val snippets = Array(
    "<b class=\"x>still attr\">",
    "<!-- <p>not text</p> -- more -->",
    "<script>var s=\"</div>\"; if(1<2){s='&amp;'}</script>",
    "<style>.a{content:\"<br>\"}</style>",
    "<br/>",
    "</EM><em id='y>z'>")

  /** Escape + splice one document deterministically off (id, position).
    * Iterates Java chars but never splits a surrogate pair: astral code
    * points pass through literally (entities and tags are pure ASCII, so
    * the extractor cannot confuse them).
    */
  private[ext] def toHtml(id: Long, text: String): String = {
    val sb = new StringBuilder(text.length * 2 + 64)
    sb.append("<!DOCTYPE html><html><head><title></title>")
    sb.append("<script>var decoy=\"<body>nope</body>\";</script>")
    sb.append("<style>body{margin:0}</style></head><body>")
    var p = 0
    while (p < text.length) {
      val c = text.charAt(p)
      c match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case _ if !Character.isSurrogate(c) && c < 128 && Character.isLetterOrDigit(c) &&
          (p + id) % 11 == 0 =>
          if (p % 2 == 0) sb.append("&#").append(c.toInt).append(';')
          else sb.append("&#x").append(Integer.toHexString(c.toInt)).append(';')
        case _ => sb.append(c)
      }
      // never splice between a surrogate pair's halves
      val atPairGap = Character.isHighSurrogate(c)
      if (!atPairGap && (p * 31 + id) % 23 == 0)
        sb.append(snippets(((p + id) % snippets.length).toInt))
      p += 1
    }
    sb.append("</body></html>")
    sb.toString
  }

  /** Synthesize one HTML page per document (map-only). */
  def encodeHtmlDocs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, toHtml(id, text)) }
      .toDF(idCol, "html")
  }

  // ---------------------------------------------------------- extractor

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** Decode one character reference starting at `amp` (the '&'). Returns
    * (decoded, positionAfter); an invalid reference returns the literal
    * '&' and advances one char — the browser-compatible fallback.
    */
  private def entity(s: String, amp: Int): (String, Int) = {
    val semi = s.indexOf(';', amp + 1)
    if (semi < 0 || semi - amp > 12) return ("&", amp + 1)
    val body = s.substring(amp + 1, semi)
    if (body.isEmpty) return ("&", amp + 1)
    if (body.charAt(0) == '#') {
      val hex = body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
      val digits = body.substring(if (hex) 2 else 1)
      if (digits.isEmpty) return ("&", amp + 1)
      try {
        val cp = Integer.parseInt(digits, if (hex) 16 else 10)
        if (cp < 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff)) ("&", amp + 1)
        else (new String(Character.toChars(cp)), semi + 1)
      } catch { case _: NumberFormatException => ("&", amp + 1) }
    } else namedEntities.get(body) match {
      case Some(d) => (d, semi + 1)
      case None    => ("&", amp + 1)
    }
  }

  /** True if `s` at `p` starts the close tag `</name` (case-insensitive)
    * followed by '>' or whitespace or EOF — the RAWTEXT exit condition.
    */
  private def closes(s: String, p: Int, name: String): Boolean = {
    if (p + 2 + name.length > s.length) return false
    if (s.charAt(p) != '<' || s.charAt(p + 1) != '/') return false
    var i = 0
    while (i < name.length) {
      if (Character.toLowerCase(s.charAt(p + 2 + i)) != name.charAt(i)) return false
      i += 1
    }
    val after = p + 2 + name.length
    after >= s.length || s.charAt(after) == '>' || Character.isWhitespace(s.charAt(after))
  }

  /** Lower-cased tag name opening at `p` (p points at '<'); empty if not
    * a name-start.
    */
  private def tagName(s: String, p: Int): String = {
    var i = p + 1
    val sb = new StringBuilder
    while (i < s.length && Character.isLetter(s.charAt(i))) {
      sb.append(Character.toLowerCase(s.charAt(i))); i += 1
    }
    sb.toString
  }

  /** Single-pass text extraction. Unterminated constructs (comment, tag,
    * raw block) consume to EOF — damaged markup never leaks as text.
    */
  private[ext] def extractText(html: String): String = {
    val out = new StringBuilder(html.length / 2)
    var p = 0
    val n = html.length
    while (p < n) {
      val c = html.charAt(p)
      if (c == '<') {
        if (html.startsWith("<!--", p)) {
          val end = html.indexOf("-->", p + 4)
          p = if (end < 0) n else end + 3
        } else {
          val name = tagName(html, p)
          // walk the tag respecting quoted attribute values
          var q = p + 1
          var quote: Char = 0
          var closed = -1
          while (closed < 0 && q < n) {
            val ch = html.charAt(q)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') closed = q
            q += 1
          }
          p = if (closed < 0) n else closed + 1
          if (closed >= 0 && (name == "script" || name == "style") &&
            html.charAt(closed - 1) != '/') {
            // RAWTEXT: content until the matching close tag is not markup
            var r = p
            while (r < n && !closes(html, r, name)) r += 1
            if (r >= n) p = n
            else {
              val gt = html.indexOf('>', r)
              p = if (gt < 0) n else gt + 1
            }
          }
        }
      } else if (c == '&') {
        val (decoded, next) = entity(html, p)
        out.append(decoded)
        p = next
      } else {
        out.append(c)
        p += 1
      }
    }
    out.toString
  }

  final case class HtmlText(doc_id: Long, n_bytes: Long, checksum: Long)

  private def rollingChecksum(data: Array[Byte]): Long = {
    var c = 0L
    var i = 0
    while (i < data.length) { c = (c * 31 + (data(i) & 0xff)) % 1000000007L; i += 1 }
    c
  }

  /** Extract text from HTML pages and reduce to the exact integers the
    * oracle recomputes from the source text. Map-only.
    */
  def htmlTextStats(pages: DataFrame, idCol: String = "doc_id", htmlCol: String = "html"): Dataset[HtmlText] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .select(col(idCol).cast("long"), col(htmlCol))
      .as[(Long, String)]
      .map { case (id, html) =>
        val text = extractText(html)
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        HtmlText(id, bytes.length.toLong, rollingChecksum(bytes))
      }
  }
}
