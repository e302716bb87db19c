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
  private[ext] def entity(s: String, amp: Int): (String, Int) = {
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
  private[ext] def closes(s: String, p: Int, name: String): Boolean = {
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
  private[ext] def tagName(s: String, p: Int): String = {
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

  // ------------------------------------------------- link graph surface

  /** Crawl link extraction: the step between page parsing ([[extractText]])
    * and the host graph ([[Graph]] pagerank/HITS) — pull every REAL
    * `<a href>` out of hostile markup, decode character references in the
    * value, and resolve root-relative hrefs against the page's host.
    *
    * The fixture ([[toHtmlWithLinks]]) plants, per page, 1–4 genuine
    * anchors in rotating attribute spellings (double-quoted,
    * single-quoted, unquoted; uppercase `<A HREF` on every 5th doc;
    * `&amp;` in the markup that must decode to `&`) interleaved with the
    * decoys a naive regex scraper trips over: anchors inside `<script>`
    * strings, anchors inside comments, `<a>` with no href, and
    * `href=""`. Absolute link targets are md5-derived so the DuckDB
    * oracle rebuilds the exact link set closed-form; root-relative
    * targets resolve to the md5-independent source host.
    *
    * Scope: `https?://…` absolute and root-relative (`/…`) hrefs — the
    * two forms that matter for a host graph; other relative forms are
    * out of fixture scope and skipped. Map-only per page; the host-edge
    * roll-up is one hash aggregate on (src_host, dst_host).
    */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private[ext] def linkCount(id: Long): Int = (id % 4).toInt + 1

  /** Source host of a page (the resolution base for root-relative hrefs). */
  private[ext] def srcHost(id: Long): String = s"src${id % 8}.example"

  /** The DECODED, RESOLVED url of link j on page id — what the extractor
    * must recover.
    */
  private[ext] def linkUrl(id: Long, j: Int): String =
    if (j % 2 == 1) {
      val hid = Integer.parseInt(md5Hex(s"l:$id:$j").substring(0, 1), 16) % 16
      s"https://host$hid.example/p/$j?a=1&b=2"
    } else s"https://${srcHost(id)}/r/$j"

  private val linkDecoys = Array(
    "<script>var l=\"<a href=\\\"https://evil.example/s\\\">x</a>\";</script>",
    "<!-- <a href=\"https://evil.example/c\">x</a> -->",
    "<a id=\"noref\">bare anchor</a>",
    "<a href=\"\">empty href</a>")

  /** Render link j of page id in its markup spelling (entity-encoded
    * ampersands; rotating quote style; uppercase tag on id % 5 == 0).
    */
  private def renderAnchor(id: Long, j: Int): String = {
    val hrefVal =
      if (j % 2 == 1) linkUrl(id, j).replace("&", "&amp;")
      else s"/r/$j"
    val quoted = ((id + j) % 3) match {
      case 0 => "\"" + hrefVal + "\""
      case 1 => "'" + hrefVal + "'"
      case _ => hrefVal // unquoted: fixture URLs carry no spaces
    }
    val (aTag, hrefAttr) = if (id % 5 == 0) ("A", "HREF") else ("a", "href")
    s"<$aTag $hrefAttr=$quoted>link $j</$aTag>"
  }

  /** Page writer with links: the [[toHtml]] hostile body plus the anchor
    * block (each real anchor chased by a decoy) before `</body>`.
    */
  private[ext] def toHtmlWithLinks(id: Long, text: String): String = {
    val base = toHtml(id, text)
    val cut = base.lastIndexOf("</body></html>")
    val sb = new StringBuilder(base.substring(0, cut))
    var j = 1
    while (j <= linkCount(id)) {
      sb.append(renderAnchor(id, j))
      sb.append(linkDecoys(((id + j) % linkDecoys.length).toInt))
      j += 1
    }
    sb.append("</body></html>")
    sb.toString
  }

  /** Synthesize one linked HTML page per document (map-only). */
  def encodeLinkedDocs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, toHtmlWithLinks(id, text)) }
      .toDF(idCol, "html")
  }

  /** Walk one attribute list (tag content from after the name to `>`)
    * and return the href value, entity-decoded; null if absent/empty.
    */
  private def hrefValue(s: String, from: Int, until: Int): String = {
    var p = from
    while (p < until) {
      // skip whitespace before an attribute name
      while (p < until && Character.isWhitespace(s.charAt(p))) p += 1
      if (p >= until) return null
      val nameStart = p
      while (p < until && !Character.isWhitespace(s.charAt(p)) &&
        s.charAt(p) != '=' && s.charAt(p) != '>') p += 1
      val name = s.substring(nameStart, p).toLowerCase
      while (p < until && Character.isWhitespace(s.charAt(p))) p += 1
      var value: String = null
      if (p < until && s.charAt(p) == '=') {
        p += 1
        while (p < until && Character.isWhitespace(s.charAt(p))) p += 1
        if (p < until) {
          val q0 = s.charAt(p)
          if (q0 == '"' || q0 == '\'') {
            val end = s.indexOf(q0, p + 1)
            val stop = if (end < 0 || end > until) until else end
            value = s.substring(p + 1, stop)
            p = if (end < 0 || end > until) until else end + 1
          } else {
            val vStart = p
            while (p < until && !Character.isWhitespace(s.charAt(p))) p += 1
            value = s.substring(vStart, p)
          }
        }
      }
      if (name == "href") {
        if (value == null || value.isEmpty) return null
        // decode character references in the attribute value
        val out = new StringBuilder(value.length)
        var i = 0
        while (i < value.length) {
          if (value.charAt(i) == '&') {
            val (d, next) = entity(value, i)
            out.append(d); i = next
          } else { out.append(value.charAt(i)); i += 1 }
        }
        val v = out.toString
        return if (v.isEmpty) null else v
      }
    }
    null
  }

  /** Single-pass link extraction: (ordinal, resolved url) per real anchor.
    * Comments and script/style rawtext are skipped with the exact
    * [[extractText]] state machine, so decoy anchors there never emit.
    */
  private[ext] def extractLinks(html: String, baseHost: String): Seq[(Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var p = 0
    val n = html.length
    while (p < n) {
      if (html.charAt(p) == '<') {
        if (html.startsWith("<!--", p)) {
          val end = html.indexOf("-->", p + 4)
          p = if (end < 0) n else end + 3
        } else {
          val name = tagName(html, p)
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
          val tagEnd = if (closed < 0) n else closed
          if (name == "a") {
            val href = hrefValue(html, p + 1 + name.length, tagEnd)
            if (href != null) {
              val url =
                if (href.startsWith("http://") || href.startsWith("https://")) href
                else if (href.startsWith("/")) s"https://$baseHost$href"
                else null // other relative forms: out of scope
              if (url != null) out.append((out.length + 1, url))
            }
          }
          p = if (closed < 0) n else closed + 1
          if (closed >= 0 && (name == "script" || name == "style") &&
            html.charAt(closed - 1) != '/') {
            var r = p
            while (r < n && !closes(html, r, name)) r += 1
            if (r >= n) p = n
            else {
              val gt = html.indexOf('>', r)
              p = if (gt < 0) n else gt + 1
            }
          }
        }
      } else p += 1
    }
    out.toSeq
  }

  /** First `<title>` element's text, entity-decoded and trimmed — the
    * head-metadata field a WAT conversion record carries. Empty string
    * when absent/unclosed (real crawls are full of both). Walks tags the
    * way [[extractLinks]] does — comments and script/style RAWTEXT are
    * skipped, so a `<title>` decoy inside either cannot be picked over
    * the real element.
    */
  private[ext] def titleOf(html: String): String = {
    val n = html.length
    var p = 0
    while (p < n) {
      if (html.charAt(p) == '<') {
        if (html.startsWith("<!--", p)) {
          val end = html.indexOf("-->", p + 4)
          p = if (end < 0) n else end + 3
        } else {
          val name = tagName(html, p)
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
          if (closed < 0) return ""
          p = closed + 1
          if ((name == "script" || name == "style") && html.charAt(closed - 1) != '/') {
            var r = p
            while (r < n && !closes(html, r, name)) r += 1
            if (r >= n) return ""
            val gt = html.indexOf('>', r)
            p = if (gt < 0) n else gt + 1
          } else if (name == "title" && html.charAt(closed - 1) != '/') {
            val sb = new java.lang.StringBuilder
            var r = p
            while (r < n && !closes(html, r, "title")) {
              if (html.charAt(r) == '&') { val (s2, np) = entity(html, r); sb.append(s2); r = np }
              else { sb.append(html.charAt(r)); r += 1 }
            }
            return if (r >= n) "" else sb.toString.trim // unclosed: no metadata
          }
        }
      } else p += 1
    }
    ""
  }

  final case class PageLink(doc_id: Long, link_idx: Long, url: String, host: String)

  /** Extract resolved links from linked pages; host parsed off the url. */
  def pageLinks(pages: DataFrame, idCol: String = "doc_id", htmlCol: String = "html"): Dataset[PageLink] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .select(col(idCol).cast("long"), col(htmlCol))
      .as[(Long, String)]
      .flatMap { case (id, html) =>
        extractLinks(html, srcHost(id)).map { case (j, url) =>
          val s = url.indexOf("://") + 3
          val slash = url.indexOf('/', s)
          val host = if (slash < 0) url.substring(s) else url.substring(s, slash)
          PageLink(id, j.toLong, url, host)
        }
      }
  }

  /** Host-pair edge roll-up: (src_host, dst_host, n) — the input the
    * pagerank/HITS family runs on. One hash aggregate.
    */
  def hostLinkEdges(pages: DataFrame, idCol: String = "doc_id", htmlCol: String = "html"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pageLinks(pages, idCol, htmlCol).toDF()
      .withColumn("src_host",
        concat(lit("src"), (col("doc_id") % 8).cast("string"), lit(".example")))
      .groupBy(col("src_host"), col("host").as("dst_host"))
      .agg(count(lit(1)).as("n"))
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
