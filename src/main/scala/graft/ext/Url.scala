package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== From-scratch RFC 3986 URL normalization ========
  *
  * Crawl pipelines dedup and join on URLs, and raw crawl URLs arrive in
  * every equivalent-but-unequal spelling: uppercase schemes and hosts,
  * explicit default ports, `/./` and `/../` dot segments,
  * percent-encoded unreserved characters, lowercase escape hex,
  * reordered query parameters, fragments. [[normalize]] reduces all of
  * them to one canonical form — the syntax-based normalization of RFC
  * 3986 §6.2.2 plus the conventional crawl extras (default-port
  * elision, query-parameter sort, fragment strip).
  *
  * Scope: `scheme://host[:port][/path][?query][#fragment]` with
  * reg-name hosts (no userinfo/IPv6 — crawl URL shape). Malformed
  * inputs (no scheme, empty host, non-numeric port) yield null fields
  * rather than throwing.
  *
  * The correctness gate is the [[Html]] hostile-round-trip pattern:
  * [[attachUrls]] renders a deterministic MESSY spelling per document —
  * which decorations apply is itself md5-derived — while the DuckDB
  * oracle derives the CANONICAL components directly from `doc_id`
  * arithmetic. The normalizer never sees the components, only the messy
  * string; equality holds only if it exactly inverts every decoration
  * (case folding, default-port drop, dot-segment removal RFC 3986
  * §5.2.4, unreserved percent-decode, escape-hex uppercase, query
  * sort, fragment strip). Map-only on both sides — zero shuffles, the
  * 100 TB shape for a per-row rewrite.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * URL path; north-star crawl-curation scope.
  */
object Url {

  final case class NormUrl(
      doc_id: Long, scheme: String, host: String, port: Long,
      path: String, query: String, url_norm: String)

  private val hostA = Array("alpha", "beta", "gamma", "delta")
  private val hostB = Array("example", "testsite")
  private val tlds = Array("com", "org", "net", "io")
  private val words = Array("data", "files", "api", "docs", "img", "posts", "user", "item")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def nib(m: String, i: Int): Int = Integer.parseInt(m.substring(i - 1, i), 16)

  private def byte2(m: String, i: Int): Int = Integer.parseInt(m.substring(i - 1, i + 1), 16)

  /** Deterministic hostile-URL fixture: renders the messy spelling whose
    * canonical form the oracle derives independently from `doc_id`.
    */
  def attachUrls(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0) // SQL `%` == floorMod only there
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .map { id =>
        val m = md5Hex(s"u:$id")
        val scheme = if (id % 2 == 0) "http" else "https"
        val host = s"${hostA(nib(m, 1) % 4)}.${hostB(nib(m, 2) % 2)}.${tlds(nib(m, 3) % 4)}"
        val seg1 = words(nib(m, 4) % 8)
        val seg2 = words(nib(m, 5) % 8) + (math.floorMod(id, 100L)).toString
        val portSel = nib(m, 6) % 4
        val qa = byte2(m, 7)
        val qb = byte2(m, 9)
        val reorder = nib(m, 11) % 2 == 1
        val frag = nib(m, 12) % 2 == 0
        val encVariant = nib(m, 13) % 3
        val hexLower = id % 2 == 1
        // decorations: every one must cancel under normalization
        val schemeStr = if (id % 3 == 0) scheme.toUpperCase else scheme
        val hostStr = if (id % 5 == 0) host.toUpperCase else host
        val defPort = if (scheme == "http") 80 else 443
        val portStr = portSel match {
          case 0 => "" // default, implicit
          case 1 => s":$defPort" // default, explicit -> must normalize away
          case 2 => ":8080"
          case _ => ":9443"
        }
        val pathStr = encVariant match {
          case 0 => // percent-encode seg1's first (unreserved) character
            val c = seg1.head.toInt
            val hex = f"$c%02X"
            s"/%${if (hexLower) hex.toLowerCase else hex}${seg1.tail}/$seg2"
          case 1 => s"/$seg1/./$seg2"
          case _ => s"/zz/../$seg1/$seg2"
        }
        val vb = s"$qb" + (if (qb % 2 == 0) { if (hexLower) "%2f" else "%2F" } else "")
        val queryStr = if (reorder) s"b=$vb&a=$qa" else s"a=$qa&b=$vb"
        val fragStr = if (frag) "#sec" else ""
        (id, s"$schemeStr://$hostStr$portStr$pathStr?$queryStr$fragStr")
      }
      .toDF("doc_id", "url")
  }

  private val unreserved: Char => Boolean = c =>
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  /** Percent-normalize one component: decode escapes of unreserved
    * characters, uppercase the hex of the rest (RFC 3986 §6.2.2.1-2).
    */
  private[ext] def normalizeEscapes(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 && Character.digit(s.charAt(i + 2), 16) >= 0) {
        val h = s.substring(i + 1, i + 3)
        val v = Integer.parseInt(h, 16)
        if (v < 128 && unreserved(v.toChar)) out.append(v.toChar)
        else out.append('%').append(h.toUpperCase) // reserved / non-ASCII stay encoded
        i += 3
      } else { out.append(c); i += 1 } // stray '%' passes through literally
    }
    out.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[ext] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', 1)
        val (seg, rest) = if (next < 0) (in, "") else (in.substring(0, next), in.substring(next))
        out.append(seg)
        in = rest
      }
    }
    out.mkString
  }

  /** Parse + normalize one URL; null fields on malformed input. */
  private[ext] def normalizeOne(id: Long, raw: String): NormUrl = {
    val bad = NormUrl(id, null, null, -1L, null, null, null)
    if (raw == null) return bad
    val noFrag = { val h = raw.indexOf('#'); if (h < 0) raw else raw.substring(0, h) }
    val si = noFrag.indexOf("://")
    if (si <= 0) return bad
    val scheme = noFrag.substring(0, si).toLowerCase
    if (!scheme.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'))
      return bad
    val rest = noFrag.substring(si + 3)
    val qi = rest.indexOf('?')
    val (authPath, rawQuery) = if (qi < 0) (rest, null) else (rest.substring(0, qi), rest.substring(qi + 1))
    val pi = authPath.indexOf('/')
    val (auth, rawPath) = if (pi < 0) (authPath, "") else (authPath.substring(0, pi), authPath.substring(pi))
    val ci = auth.indexOf(':')
    val (hostRaw, portRaw) = if (ci < 0) (auth, null) else (auth.substring(0, ci), auth.substring(ci + 1))
    if (hostRaw.isEmpty) return bad
    val host = hostRaw.toLowerCase
    val defaultPort = scheme match {
      case "http" => 80L
      case "https" => 443L
      case _ => -1L
    }
    val port =
      if (portRaw == null || portRaw.isEmpty) -1L
      else if (portRaw.forall(_.isDigit)) {
        val p = portRaw.toLong
        if (p == defaultPort) -1L else p
      } else return bad
    val path = {
      val p = removeDotSegments(normalizeEscapes(rawPath))
      if (p.isEmpty) "/" else p
    }
    val query =
      if (rawQuery == null) null
      else rawQuery.split("&", -1).toSeq
        .map(normalizeEscapes)
        .sortBy(p => { val e = p.indexOf('='); if (e < 0) p else p.substring(0, e) })
        .mkString("&")
    val norm = new StringBuilder()
      .append(scheme).append("://").append(host)
    if (port >= 0) norm.append(':').append(port)
    norm.append(path)
    if (query != null) norm.append('?').append(query)
    NormUrl(id, scheme, host, port, path, query, norm.toString)
  }

  /** Normalize a (doc_id, url) relation — map-only, one row per input. */
  def normalize(urls: DataFrame, idCol: String = "doc_id", urlCol: String = "url"): Dataset[NormUrl] = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls
      .select(col(idCol).cast("long"), col(urlCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, raw) => normalizeOne(id, raw) }
  }
}
