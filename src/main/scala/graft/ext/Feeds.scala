package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== RSS / Atom feed ingestion ========
  *
  * The discovery complement to [[Sitemaps]]: a sitemap is the
  * crawl-budget view a host PUBLISHES, a feed is how fresh content
  * actually ANNOUNCES itself — real discovery pipelines poll both. This
  * module ingests each host's feed pair in both live dialects:
  *
  *  - '''RSS 2.0''': `<rss version="2.0"><channel><item>` with
  *    `<link>`, `<guid>`, and an RFC 822 `<pubDate>` ("Thu, 05 Feb 2026
  *    10:30:00 GMT", zone also as ±HHMM);
  *  - '''Atom''' (RFC 4287): `<feed><entry>` with the link in an
  *    ATTRIBUTE (`<link href="…"/>`), `<id>`, and an ISO-8601/RFC 3339
  *    `<updated>` ("2026-02-05T10:30:00Z", zone also as ±HH:MM).
  *
  * Both ride the [[Sitemaps.parseLeaves]] strict XML walker (the
  * attribute-capturing profile), so CDATA sections, the five named
  * entities, numeric character references, comments, and declarations
  * are all handled once, identically, across the XML ingest family.
  * Dates are REDUCED TO EPOCH SECONDS by from-scratch RFC 822 /
  * RFC 3339 parsers (days-from-civil arithmetic, explicit zone offsets)
  * — the canonical join key for freshness scheduling; a malformed date,
  * a missing element, an out-of-order entry, or any XML damage
  * quarantines the WHOLE host, the family's blast-radius contract.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * feed surface; north-star crawl-discovery scope. 100 TB shape: one
  * groupByKey on host (a host's feed pair is KB-scale by protocol
  * convention — bounded groups, unlike the document corpus), pure
  * per-group compute after, flat output ready to join [[Robots]]
  * decisions and crawl scheduling.
  */
object Feeds {

  final class MalformedFeed extends RuntimeException("malformed feed", null, false, false)
  private def fail(): Nothing = throw new MalformedFeed

  // ------------------------------------------------------- date parsing

  /** Days from 1970-01-01 for a civil date (proleptic Gregorian) —
    * Hinnant's days_from_civil, the standard branchless derivation.
    */
  private[ext] def daysFromCivil(y0: Int, m: Int, d: Int): Long = {
    val y = if (m <= 2) y0 - 1 else y0
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era.toLong * 146097 + doe - 719468
  }

  private val Months = Map(
    "Jan" -> 1, "Feb" -> 2, "Mar" -> 3, "Apr" -> 4, "May" -> 5, "Jun" -> 6,
    "Jul" -> 7, "Aug" -> 8, "Sep" -> 9, "Oct" -> 10, "Nov" -> 11, "Dec" -> 12)

  private def num(s: String): Int = {
    if (s.isEmpty || !s.forall(_.isDigit)) fail()
    s.toInt
  }

  /** RFC 822/1123 date ("Thu, 05 Feb 2026 10:30:00 GMT") → epoch
    * seconds. The redundant weekday is ignored (every real parser
    * does); zone accepts GMT/UT/UTC/Z and ±HHMM.
    */
  private[ext] def parseRfc822(s0: String): Long = {
    val s = s0.trim
    val comma = s.indexOf(',')
    val rest = (if (comma >= 0) s.substring(comma + 1) else s).trim
    val parts = rest.split("\\s+")
    if (parts.length != 5) fail()
    val d = num(parts(0))
    val m = Months.getOrElse(parts(1), fail())
    val y = num(parts(2))
    val hms = parts(3).split(':')
    if (hms.length != 3) fail()
    val (h, mi, sec) = (num(hms(0)), num(hms(1)), num(hms(2)))
    if (d < 1 || d > 31 || h > 23 || mi > 59 || sec > 60) fail()
    val off = parts(4) match {
      case "GMT" | "UT" | "UTC" | "Z" => 0L
      case z if z.length == 5 && (z.head == '+' || z.head == '-') =>
        val v = (num(z.substring(1, 3)) * 3600 + num(z.substring(3, 5)) * 60).toLong
        if (z.head == '-') -v else v
      case _ => fail()
    }
    daysFromCivil(y, m, d) * 86400L + h * 3600L + mi * 60L + sec - off
  }

  /** RFC 3339 ("2026-02-05T10:30:00Z", zone also ±HH:MM) → epoch
    * seconds. Fractional seconds are accepted and truncated.
    */
  private[ext] def parseRfc3339(s0: String): Long = {
    val s = s0.trim
    if (s.length < 20 || s.charAt(4) != '-' || s.charAt(7) != '-' ||
      (s.charAt(10) != 'T' && s.charAt(10) != 't') ||
      s.charAt(13) != ':' || s.charAt(16) != ':') fail()
    val y = num(s.substring(0, 4)); val m = num(s.substring(5, 7)); val d = num(s.substring(8, 10))
    val h = num(s.substring(11, 13)); val mi = num(s.substring(14, 16)); val sec = num(s.substring(17, 19))
    if (m < 1 || m > 12 || d < 1 || d > 31 || h > 23 || mi > 59 || sec > 60) fail()
    var p = 19
    if (p < s.length && s.charAt(p) == '.') { p += 1; while (p < s.length && s.charAt(p).isDigit) p += 1 }
    if (p >= s.length) fail()
    val off = s.charAt(p) match {
      case 'Z' | 'z' => if (p + 1 != s.length) fail() else 0L
      case c @ ('+' | '-') =>
        if (p + 6 != s.length || s.charAt(p + 3) != ':') fail()
        val v = (num(s.substring(p + 1, p + 3)) * 3600 + num(s.substring(p + 4, p + 6)) * 60).toLong
        if (c == '-') -v else v
      case _ => fail()
    }
    daysFromCivil(y, m, d) * 86400L + h * 3600L + mi * 60L + sec - off
  }

  // ------------------------------------------------------------- writer

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val MonthNames = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val DayNames = Array("Thu", "Fri", "Sat", "Sun", "Mon", "Tue", "Wed") // epoch day 0 = Thu

  /** Per-doc deterministic publication instant: month/day/time/zone all
    * md5-free closed forms of doc_id, so the oracle replays the epoch
    * relationally. Zone cycles GMT(+0000)/+0530/−0800 to exercise real
    * offset arithmetic.
    */
  private def itemDate(id: Long): (Int, Int, Int, Int, Long) = {
    val m = (1 + id % 12).toInt
    val d = (1 + id % 28).toInt
    val h = (id % 24).toInt
    val mi = (id % 60).toInt
    val offSec = (id % 4) match {
      case 2 => 19800L
      case 3 => -28800L
      case _ => 0L
    }
    (m, d, h, mi, offSec)
  }

  private def itemLink(host: String, path: String, id: Long): String =
    s"https://$host$path" + (if (id % 5 == 0) "?a=1&b=2" else "")

  private def itemGuid(host: String, id: Long): String = s"urn:feed:$host:$id"

  /** Serialize each host's docs as a FEED PAIR: `feed.rss` carries the
    * even doc_ids as RSS 2.0 items, `feed.atom` the odd ones as Atom
    * entries, both ordered by doc_id. Hazards cycle deterministically:
    * `id % 5 == 0` appends an entity-escaped query string to the link,
    * `id % 7 == 0` wraps the RSS link / Atom id in CDATA, and the zone
    * cycles GMT, ±HHMM offsets (RSS) and Z, ±HH:MM (Atom). Output: one
    * row per FILE (host, file_name, payload).
    */
  def encodeFeeds(urls: DataFrame): DataFrame = {
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
        val rss = {
          val sb = new StringBuilder
          sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
          sb.append("<rss version=\"2.0\">\n<channel>\n")
          sb.append("<title>").append(esc(host)).append(" feed</title>\n")
          sb.append("<link>").append(esc(s"https://$host/")).append("</link>\n")
          sb.append("<description>updates</description>\n")
          docs.iterator.filter(_._1 % 2 == 0).foreach { case (id, _, path) =>
            val raw = itemLink(host, path, id)
            val link = if (id % 7 == 0) s"<![CDATA[$raw]]>" else esc(raw)
            val (m, d, h, mi, _) = itemDate(id)
            val zone = (id % 4) match {
              case 1 => "+0000"
              case 2 => "+0530"
              case 3 => "-0800"
              case _ => "GMT"
            }
            val wd = DayNames((daysFromCivil(2026, m, d) % 7).toInt)
            sb.append("<item>\n<title>doc ").append(id).append("</title>\n")
            sb.append("<link>").append(link).append("</link>\n")
            sb.append("<guid>").append(esc(itemGuid(host, id))).append("</guid>\n")
            sb.append(f"<pubDate>$wd, $d%02d ${MonthNames(m - 1)} 2026 $h%02d:$mi%02d:00 $zone</pubDate>\n")
            sb.append("</item>\n")
          }
          sb.append("</channel>\n</rss>\n")
          sb.toString
        }
        val atom = {
          val sb = new StringBuilder
          sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
          sb.append("<feed xmlns=\"http://www.w3.org/2005/Atom\">\n")
          sb.append("<title>").append(esc(host)).append(" feed</title>\n")
          sb.append("<updated>2026-01-01T00:00:00Z</updated>\n")
          docs.iterator.filter(_._1 % 2 == 1).foreach { case (id, _, path) =>
            val raw = itemLink(host, path, id)
            val guid = itemGuid(host, id)
            val gid = if (id % 7 == 0) s"<![CDATA[$guid]]>" else esc(guid)
            val (m, d, h, mi, _) = itemDate(id)
            val zone = (id % 4) match {
              case 1 => "+00:00"
              case 2 => "+05:30"
              case 3 => "-08:00"
              case _ => "Z"
            }
            sb.append("<entry>\n<title>doc ").append(id).append("</title>\n")
            sb.append("<link href=\"").append(esc(raw).replace("\"", "&quot;")).append("\"/>\n")
            sb.append("<id>").append(gid).append("</id>\n")
            sb.append(f"<updated>2026-$m%02d-$d%02dT$h%02d:$mi%02d:00$zone</updated>\n")
            sb.append("</entry>\n")
          }
          sb.append("</feed>\n")
          sb.toString
        }
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        Iterator(
          (host, "feed.rss", rss.getBytes(utf8)),
          (host, "feed.atom", atom.getBytes(utf8)))
      }
      .toDF("host", "file_name", "payload")
  }

  // ------------------------------------------------------------- reader

  final case class FeedEntry(host: String, dialect: String, ord: Long,
      link: String, guid: String, published: Long)

  /** Ingest a host's feed pair: parse `feed.rss` (RSS 2.0 — version
    * attribute checked) and `feed.atom` (link from the `href`
    * attribute), reduce each item to (link, guid, epoch seconds).
    * Strictness: both files present exactly once, every item carries
    * all three fields in document order, dates parse under the
    * RFC 822 / RFC 3339 grammars — any violation, or XML damage,
    * quarantines the whole host.
    */
  def feedExtract(files: DataFrame): Dataset[FeedEntry] = {
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
            if (byName.put(name, payload).isDefined) fail()
          }
          val utf8 = java.nio.charset.StandardCharsets.UTF_8
          val rssLeaves = Sitemaps.parseLeaves(
            new String(byName.getOrElse("feed.rss", fail()), utf8), withAttrs = true)
          val atomLeaves = Sitemaps.parseLeaves(
            new String(byName.getOrElse("feed.atom", fail()), utf8), withAttrs = true)
          if (byName.size != 2) fail()
          if (!rssLeaves.contains(("rss@version", "2.0"))) fail()
          val out = Vector.newBuilder[FeedEntry]
          // RSS: link → guid → pubDate per item, document order
          var link: String = null
          var guid: String = null
          var ord = 0L
          rssLeaves.foreach {
            case ("rss/channel/item/link", v) =>
              if (link != null) fail()
              link = v
            case ("rss/channel/item/guid", v) =>
              if (link == null || guid != null) fail()
              guid = v
            case ("rss/channel/item/pubDate", v) =>
              if (link == null || guid == null) fail()
              out += FeedEntry(host, "rss", ord, link, guid, parseRfc822(v))
              link = null; guid = null; ord += 1
            case _ => ()
          }
          if (link != null || guid != null) fail()
          // Atom: link@href → id → updated per entry, document order
          ord = 0L
          atomLeaves.foreach {
            case ("feed/entry/link@href", v) =>
              if (link != null) fail()
              link = v
            case ("feed/entry/id", v) =>
              if (link == null || guid != null) fail()
              guid = v
            case ("feed/entry/updated", v) =>
              if (link == null || guid == null) fail()
              out += FeedEntry(host, "atom", ord, link, guid, parseRfc3339(v))
              link = null; guid = null; ord += 1
            case _ => ()
          }
          if (link != null || guid != null) fail()
          out.result().iterator
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
  }
}
