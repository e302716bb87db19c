package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== Sitemap protocol ingestion (sitemaps.org / XML) ========
  *
  * The discovery half of the crawl stack next to [[Robots]] admission:
  * a host publishes a `sitemapindex` referencing child sitemaps, each a
  * `urlset` of `<url><loc>…</loc><lastmod>…</lastmod></url>` entries —
  * and real files arrive with every XML hazard: entity-escaped URLs
  * (`&amp;`), CDATA-wrapped locs, comments, an XML declaration,
  * namespace attributes, host-dependent pretty-printing, and GZIPPED
  * children (`.xml.gz` — decoded by composition through the repo's own
  * gzip member reader, the same layering contract as `tgz_extract`).
  *
  * The parser is a real single-pass XML walker for the sitemap profile:
  * declaration and comment skipping, attribute-tolerant open tags,
  * CDATA sections, and the five named entities plus `&#NN;`/`&#xNN;`
  * numeric references. It is STRICT inside the profile — unbalanced
  * tags, foreign top-level elements, a child file the index never
  * referenced, or a damaged gzip member all quarantine the whole host
  * (the archive-family damage discipline: never half-read a corrupted
  * source).
  *
  * 100 TB shape: one groupByKey on host brings a host's index + child
  * files together (a host's sitemap set is KB–MB, bounded by the
  * protocol's 50k-URL/50MB limits — the group is small by spec, unlike
  * the document corpus); parsing is then pure per-group compute and the
  * output is a flat URL table ready to join [[Robots]] decisions.
  * No reference citation — north-star crawl scope.
  */
object Sitemaps {

  final class MalformedSitemap extends RuntimeException("malformed sitemap", null, false, false)
  private def fail(): Nothing = throw new MalformedSitemap

  // ------------------------------------------------------------- writer

  private[ext] def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Serialize each host's URL set as sitemap FILES: an index
    * (`sitemap.xml`) naming two children — `sitemap-0.xml` plain and
    * `sitemap-1.xml.gz` gzipped — with docs sharded by `doc_id % 2` and
    * ordered by doc_id inside each child. Hazards cycle
    * deterministically: `doc_id % 5 == 0` appends an ampersand query
    * string (entity-escaped), `doc_id % 7 == 0` wraps the loc in CDATA
    * instead, and odd-md5 hosts pretty-print with indentation while
    * even ones emit flat lines. Output: one row per FILE
    * (host, file_name, payload).
    */
  def encodeSitemaps(urls: DataFrame): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls
      .select(col("doc_id").cast("long"), col("host").cast("string"), col("path").cast("string"))
      .filter(col("doc_id").isNotNull && col("doc_id") >= 0 &&
        col("host").isNotNull && col("path").isNotNull)
      .as[(Long, String, String)]
      .groupByKey(_._2)
      .flatMapGroups { (host, it) =>
        val docs = it.toArray.sortBy(_._1)
        val pretty = (Integer.parseInt(java.security.MessageDigest.getInstance("MD5")
          .digest(host.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 1), 16) % 2) == 1
        val (ind, nl) = if (pretty) ("  ", "\n") else ("", "")
        def urlsetXml(shard: Int): String = {
          val sb = new StringBuilder
          sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>").append(nl)
          sb.append("<!-- generated for ").append(host).append(" -->").append(nl)
          sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">").append(nl)
          docs.iterator.filter(_._1 % 2 == shard).foreach { case (id, _, path) =>
            val raw = s"https://$host$path" + (if (id % 5 == 0) "?a=1&b=2" else "")
            val loc = if (id % 7 == 0) s"<![CDATA[$raw]]>" else esc(raw)
            val lastmod = f"2026-01-${1 + id % 28}%02d"
            sb.append(ind).append("<url>").append(nl)
            sb.append(ind).append(ind).append("<loc>").append(loc).append("</loc>").append(nl)
            sb.append(ind).append(ind).append("<lastmod>").append(lastmod).append("</lastmod>").append(nl)
            sb.append(ind).append("</url>").append(nl)
          }
          sb.append("</urlset>").append(nl)
          sb.toString
        }
        val indexXml = {
          val sb = new StringBuilder
          sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>").append(nl)
          sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">").append(nl)
          Seq("sitemap-0.xml", "sitemap-1.xml.gz").foreach { f =>
            sb.append(ind).append("<sitemap>").append(nl)
            sb.append(ind).append(ind).append("<loc>").append(esc(s"https://$host/$f")).append("</loc>").append(nl)
            sb.append(ind).append("</sitemap>").append(nl)
          }
          sb.append("</sitemapindex>").append(nl)
          sb.toString
        }
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        Iterator(
          (host, "sitemap.xml", indexXml.getBytes(utf8)),
          (host, "sitemap-0.xml", urlsetXml(0).getBytes(utf8)),
          (host, "sitemap-1.xml.gz",
            Archives.gzipMember(urlsetXml(1).getBytes(utf8), 2, host.hashCode.toLong, method = 2)))
      }
      .toDF("host", "file_name", "payload")
  }

  // ------------------------------------------------------------- parser

  /** Decode the five named XML entities plus decimal/hex numeric
    * references; a bare or unterminated `&` is malformed.
    */
  private[ext] def unescapeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0) fail()
        val name = s.substring(i + 1, semi)
        name match {
          case "amp" => sb.append('&')
          case "lt" => sb.append('<')
          case "gt" => sb.append('>')
          case "quot" => sb.append('"')
          case "apos" => sb.append('\'')
          case _ =>
            if (name.length >= 2 && name.charAt(0) == '#') {
              val cp =
                try {
                  if (name.charAt(1) == 'x' || name.charAt(1) == 'X')
                    Integer.parseInt(name.substring(2), 16)
                  else Integer.parseInt(name.substring(1), 10)
                } catch { case _: NumberFormatException => fail() }
              if (cp <= 0 || cp > 0x10FFFF) fail()
              sb.appendAll(Character.toChars(cp))
            } else fail()
        }
        i = semi + 1
      }
    }
    sb.toString
  }

  /** Minimal strict XML pull for the sitemap profile: returns the list
    * of (tagPath, text) leaf entries under the single root element.
    * Handles declarations, comments, CDATA (returned VERBATIM, not
    * entity-decoded, per XML), attribute-tolerant open tags, and
    * self-closing tags; mismatched close tags or trailing content fail.
    *
    * With `withAttrs = true` (the [[Feeds]] profile — Atom carries its
    * link in an attribute), every attribute of an open or self-closing
    * tag ALSO emits a `path@name → entity-decoded value` entry at the
    * tag's position in document order; malformed attribute syntax
    * (missing `=`, unquoted or unterminated value) fails. The default
    * keeps the sitemap behavior byte-identical: attributes tolerated,
    * ignored.
    *
    * With `withRawText = true` (the [[Docx]] profile — OOXML `w:t` runs
    * carry `xml:space="preserve"` edge whitespace the consumer must keep
    * or trim PER ELEMENT), text leaves are emitted UNTRIMMED (still
    * entity-decoded) and even when whitespace-only, leaving the
    * trim-unless-preserve decision to the caller, which correlates each
    * text leaf with its element's `@<` marker and `@xml:space` attribute
    * entry. Inter-element indentation then surfaces as whitespace leaves
    * on container paths — consumers filter by path.
    *
    * With `allowMixed = true` (the [[Odt]] profile — ODF paragraphs are
    * inherently mixed content: `<text:p>plain <text:span>styled</text:span>
    * tail</text:p>`), text pending when a CHILD element opens is emitted
    * as a leaf of the current path at that position instead of failing,
    * so a consumer walking leaves in order sees text and child-element
    * markers interleaved exactly as the document had them. The default
    * keeps mixed content a hard failure for every existing profile.
    */
  private[ext] def parseLeaves(xml: String, withAttrs: Boolean = false,
      withMarkers: Boolean = false, withRawText: Boolean = false,
      allowMixed: Boolean = false): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    val text = new StringBuilder
    var sawRoot = false
    var textIsCdata = false
    // emit pending text as a leaf of the CURRENT stack path (close tags
    // and, under allowMixed, child-element opens), then clear
    def flushText(): Unit = {
      val t = text.toString
      if (withRawText) {
        if (t.nonEmpty || textIsCdata)
          out += ((stack.mkString("/"), if (textIsCdata) t else unescapeXml(t)))
      } else if (t.exists(!Character.isWhitespace(_)) || textIsCdata)
        out += ((stack.mkString("/"), if (textIsCdata) t else unescapeXml(t.trim)))
      text.setLength(0); textIsCdata = false
    }
    var i = 0
    while (i < xml.length) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.startsWith("<?", i)) { // declaration / PI
          val e = xml.indexOf("?>", i)
          if (e < 0) fail()
          i = e + 2
        } else if (xml.startsWith("<!--", i)) {
          val e = xml.indexOf("-->", i)
          if (e < 0) fail()
          i = e + 3
        } else if (xml.startsWith("<![CDATA[", i)) {
          val e = xml.indexOf("]]>", i)
          if (e < 0 || stack.isEmpty) fail()
          text.append(xml.substring(i + 9, e))
          textIsCdata = true
          i = e + 3
        } else if (xml.startsWith("</", i)) {
          val e = xml.indexOf('>', i)
          if (e < 0 || stack.isEmpty) fail()
          val name = xml.substring(i + 2, e).trim
          if (name != stack.last) fail()
          flushText()
          stack.remove(stack.length - 1)
          i = e + 1
        } else {
          val e = xml.indexOf('>', i)
          if (e < 0) fail()
          val inner = xml.substring(i + 1, e)
          val selfClosing = inner.endsWith("/")
          val body = if (selfClosing) inner.dropRight(1) else inner
          val name = body.takeWhile(ch => !Character.isWhitespace(ch)).trim
          if (name.isEmpty) fail()
          if (stack.isEmpty) {
            if (sawRoot) fail() // two top-level elements
            sawRoot = true
          }
          // mixed-content text belongs to an ELEMENT — prolog whitespace
          // (before the root) is not content even in mixed mode
          if (allowMixed && stack.nonEmpty) flushText()
          else {
            if (text.exists(!Character.isWhitespace(_))) fail() // mixed content: not in profile
            text.setLength(0); textIsCdata = false
          }
          if (withAttrs) {
            val path = (stack :+ name).mkString("/")
            // element-boundary marker: attribute-correlating consumers
            // (OPF manifests) must not merge adjacent elements when one
            // is missing an attribute — `@<` cannot collide with real
            // attribute names ('<' is a delimiter)
            if (withMarkers) out += ((path + "@<", ""))
            var p = name.length
            while (p < body.length) {
              while (p < body.length && Character.isWhitespace(body.charAt(p))) p += 1
              if (p < body.length) {
                val eq = body.indexOf('=', p)
                if (eq < 0) fail()
                val an = body.substring(p, eq).trim
                if (an.isEmpty || an.exists(Character.isWhitespace)) fail()
                var v = eq + 1
                while (v < body.length && Character.isWhitespace(body.charAt(v))) v += 1
                if (v >= body.length || (body.charAt(v) != '"' && body.charAt(v) != '\'')) fail()
                val q = body.charAt(v)
                val ve = body.indexOf(q, v + 1)
                if (ve < 0) fail()
                out += ((path + "@" + an, unescapeXml(body.substring(v + 1, ve))))
                p = ve + 1
              }
            }
          }
          if (!selfClosing) stack += name
          i = e + 1
        }
      } else { text.append(c); i += 1 }
    }
    if (stack.nonEmpty || !sawRoot) fail()
    out.result()
  }

  final case class SitemapEntry(host: String, shard: Long, ord: Long,
      loc: String, lastmod: String)

  /** Ingest a host's sitemap FILE set: locate `sitemap.xml`, parse the
    * `sitemapindex`, resolve each referenced child within the group
    * (gunzipping `.gz` members through the repo's own reader), parse
    * each `urlset`, and emit one row per URL with its child shard and
    * ordinal. Strictness: every referenced child must exist exactly
    * once, every present child file must be referenced, and any XML or
    * gzip damage drops the WHOLE host.
    */
  def sitemapExtract(files: DataFrame, maxFileBytes: Int = 1 << 26): Dataset[SitemapEntry] = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("host").cast("string"), col("file_name").cast("string"), col("payload"))
      .as[(String, String, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (host, it) =>
        try {
          val byName = scala.collection.mutable.HashMap.empty[String, Array[Byte]]
          it.foreach { case (_, name, payload) =>
            if (byName.put(name, payload).isDefined) fail() // duplicate file
          }
          val utf8 = java.nio.charset.StandardCharsets.UTF_8
          val index = byName.getOrElse("sitemap.xml", fail())
          val indexLeaves = parseLeaves(new String(index, utf8))
          val childUrls = indexLeaves.collect { case ("sitemapindex/sitemap/loc", v) => v }
          if (childUrls.isEmpty) fail()
          if (childUrls.size != byName.size - 1) fail() // unreferenced child files
          val out = Vector.newBuilder[SitemapEntry]
          childUrls.zipWithIndex.foreach { case (u, shard) =>
            val prefix = s"https://$host/"
            if (!u.startsWith(prefix)) fail()
            val fname = u.substring(prefix.length)
            val raw = byName.getOrElse(fname, fail())
            val xmlBytes =
              if (fname.endsWith(".gz")) {
                val (data, end) = Archives.gunzipMember(raw, 0, raw.length, maxFileBytes)
                if (end != raw.length) fail()
                data
              } else raw
            val leaves = parseLeaves(new String(xmlBytes, utf8))
            // leaves arrive in document order: pair loc with the lastmod
            // that follows it inside the same <url>
            var ord = 0L
            var pendingLoc: String = null
            leaves.foreach {
              case ("urlset/url/loc", v) =>
                if (pendingLoc != null) fail()
                pendingLoc = v
              case ("urlset/url/lastmod", v) =>
                if (pendingLoc == null) fail()
                out += SitemapEntry(host, shard.toLong, ord, pendingLoc, v)
                pendingLoc = null
                ord += 1
              case _ => ()
            }
            if (pendingLoc != null) fail()
          }
          out.result().iterator
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
  }
}
