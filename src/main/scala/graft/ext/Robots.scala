package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== robots.txt policy evaluation ========
  *
  * The admission-control step of a crawl pipeline: given a per-host rule
  * set (Allow/Disallow path prefixes) and a normalized URL, decide
  * whether the URL may be fetched. Semantics are the de-facto standard
  * (Google's robots.txt spec, now RFC 9309): among the rules whose
  * prefix matches the path, the LONGEST match wins; on a length tie,
  * Allow wins; no matching rule means Allow.
  *
  * The decision is computed relationally, not per-row-imperatively: one
  * broadcast join URL×rules on the host, prefix filter, then a single
  * integer argmax — the (length, allow) preference order packs into
  * `len·2 + allowFlag` so `max()` IS the longest-match-allow-wins rule,
  * and the DuckDB oracle replays the identical packing. 100 TB shape:
  * rule sets are per-host and tiny (broadcast); the scan side is one
  * pass, one aggregate, no skew beyond host popularity.
  *
  * No reference citation — the reference has no crawl path; north-star
  * scope, composing with [[Url]]'s normalized output.
  */
object Robots {

  final case class HostRule(host: String, rule_type: String, prefix: String)

  private val words = Array("data", "files", "api", "docs", "img", "posts", "user", "item")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Deterministic per-host rule fixture (md5-derived, SQL-replayable):
    * a directory Disallow, a deeper Allow override under it, and an
    * independent two-segment Disallow — so every preference case
    * (longest wins, tie → allow, no match → allow) occurs organically.
    */
  def rulesFor(hosts: DataFrame, hostCol: String = "host"): Dataset[HostRule] = {
    val spark = hosts.sparkSession
    import spark.implicits._
    hosts
      .select(col(hostCol).cast("string"))
      .filter(col(hostCol).isNotNull)
      .distinct()
      .as[String]
      .flatMap { host =>
        val m = md5Hex(host)
        def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
        val w1 = words(nib(1) % 8)
        val w2 = words(nib(2) % 8)
        val w3 = words(nib(3) % 8)
        val w4 = words(nib(4) % 8)
        Seq(
          HostRule(host, "disallow", s"/$w1"),
          HostRule(host, "allow", s"/$w1/$w2"),
          HostRule(host, "disallow", s"/$w3/$w4"))
      }
  }

  // ------------------------------------------- robots.txt TEXT protocol

  /** Serialize each host's rule set as an actual robots.txt file — the
    * bytes a fetcher receives — salted with every parse hazard the wild
    * serves: comment lines, a Sitemap line outside any group, unknown
    * in-group directives (Crawl-delay), mixed-case field names, a
    * no-space `disallow:` spelling, empty-pattern rules (ignored per
    * REP), blank lines inside a group (groups end at the next
    * user-agent line per RFC 9309, NOT at blank lines), stacked
    * user-agent lines sharing one group, and CRLF line endings on half
    * the hosts. Rule content is md5-derived like [[rulesFor]] so the
    * DuckDB oracle replays the DECISIONS closed-form while the Spark
    * side must actually parse the text to reach them: the `*` group
    * carries the nib-1..4 directory rules plus two slash-star-digit-$
    * wildcard
    * rules (nibs 5/6), and hosts with even nib 7 add a GraftBot group
    * (nibs 8..13) that the graftbot agent must select INSTEAD of `*`.
    */
  def encodeRobotsTxt(hosts: DataFrame, hostCol: String = "host"): DataFrame = {
    val spark = hosts.sparkSession
    import spark.implicits._
    hosts
      .select(col(hostCol).cast("string"))
      .filter(col(hostCol).isNotNull)
      .distinct()
      .as[String]
      .map { host =>
        val m = md5Hex(host)
        def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
        def w(i: Int) = words(nib(i) % 8)
        def d(i: Int) = ('0' + nib(i) % 10).toChar
        val sb = new StringBuilder
        sb.append(s"# robots.txt for $host\n")
        sb.append(s"Sitemap: https://$host/sitemap.xml\n")
        sb.append("\n")
        sb.append("User-agent: *\n")
        sb.append(s"Crawl-delay: ${1 + nib(15) % 9}\n")
        sb.append(s"Disallow: /${w(1)}\n")
        sb.append(s"Allow: /${w(1)}/${w(2)}\n")
        sb.append(s"disallow:/${w(3)}/${w(4)}\n")
        sb.append("\n") // blank line inside the group: must NOT end it
        sb.append(s"Disallow: /*${d(5)}$$\n")
        sb.append(s"Allow: /*${d(6)}$$  # trailing comment\n")
        sb.append("Disallow:\n") // empty pattern: ignored, not allow-all
        if (nib(7) % 2 == 0) {
          sb.append("\n")
          sb.append("User-Agent: GraftBot\n")
          sb.append("User-agent: otherbot\n")
          sb.append(s"crawl-delay: ${1 + nib(16) % 9}\n")
          sb.append(s"Disallow: /${w(8)}\n")
          sb.append(s"Allow: /${w(8)}/${w(9)}\n")
          sb.append(s"Disallow: /${w(10)}/${w(11)}\n")
          sb.append(s"Disallow: /*${d(12)}$$\n")
          sb.append(s"Allow: /*${d(13)}$$\n")
        }
        val txt = sb.toString
        (host, if (nib(14) % 2 == 0) txt.replace("\n", "\r\n") else txt)
      }
      .toDF("host", "robots_txt")
  }

  /** Parse a robots.txt per RFC 9309: lines split on LF (CR trimmed),
    * `#` comments stripped, `field: value` on the first colon with the
    * field case-insensitive; consecutive user-agent lines stack into
    * one group and a user-agent line after rules starts a new one;
    * blank lines and unknown directives neither end nor break a group.
    * Returns the (isAllow, pattern) rules of the MOST SPECIFIC
    * applicable group set: all groups naming `agent` (case-insensitive
    * product token) if any exist, else all `*` groups — never a mix.
    * Empty patterns are dropped.
    */
  private final class Group {
    val agents = scala.collection.mutable.Set.empty[String]
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var delay: Option[Long] = None // last Crawl-delay line in the group wins
  }

  /** The shared group walk: parse `txt` into agent groups and return the
    * MOST SPECIFIC applicable set — all groups naming `agent` if any
    * exist, else all `*` groups, never a mix.
    */
  private def parseGroups(txt: String, agent: String): Seq[Group] = {
    val wanted = agent.toLowerCase
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var inAgents = false // last significant line was a user-agent line
    txt.split("\n", -1).foreach { raw =>
      val noCr = if (raw.endsWith("\r")) raw.dropRight(1) else raw
      val hash = noCr.indexOf('#')
      val line = (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              if (!inAgents || groups.isEmpty) {
                groups += new Group
                inAgents = true
              }
              groups.last.agents += value.toLowerCase
            case "allow" | "disallow" =>
              inAgents = false
              if (groups.nonEmpty && value.nonEmpty)
                groups.last.rules += ((field == "allow", value))
            case "crawl-delay" =>
              // the de-facto politeness directive (not in RFC 9309 but
              // honored by most crawlers): whole non-negative seconds
              // only; anything else (fractions, units, garbage) is
              // ignored like any unknown value. Capped so a hostile
              // file can't park a scheduler for centuries.
              inAgents = false
              if (groups.nonEmpty && value.nonEmpty && value.length <= 6 &&
                  value.forall(c => c >= '0' && c <= '9'))
                groups.last.delay = Some(value.toLong)
            case _ =>
              // unknown directive (sitemap, host, ...): part of the
              // group but ignored; it DOES end an agent-line run
              inAgents = false
          }
        }
      }
    }
    val named = groups.filter(_.agents.contains(wanted))
    (if (named.nonEmpty) named else groups.filter(_.agents.contains("*"))).toSeq
  }

  private[ext] def parseRobotsTxt(txt: String, agent: String): Array[(Boolean, String)] =
    parseGroups(txt, agent).flatMap(_.rules).toArray

  /** The Crawl-delay (seconds) the selected group set imposes on `agent`:
    * the last declared delay among the chosen groups, 0 when none —
    * group selection is IDENTICAL to rule selection, so a GraftBot
    * group's delay replaces `*`'s, never merges with it.
    */
  private[ext] def parseCrawlDelay(txt: String, agent: String): Long =
    parseGroups(txt, agent).flatMap(_.delay).lastOption.getOrElse(0L)

  /** RFC 9309 path-pattern match: `*` matches any byte run, a TRAILING
    * `$` anchors the pattern to the path end (elsewhere `$` is
    * literal); without the anchor the pattern matches any path PREFIX.
    * Iterative glob with star backtracking — linear in practice,
    * worst-case |pat|·|path| with tiny patterns.
    */
  private[ext] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0; var si = 0
    var starPi = -1; var starSi = 0
    while (si < path.length) {
      if (!anchored && pi == pat.length) return true // prefix consumed
      if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; pi += 1; starSi = si
      } else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (starPi >= 0) {
        starSi += 1; si = starSi; pi = starPi + 1
      } else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  final case class TxtDecision(doc_id: Long, host: String, path: String,
      matched_len: Long, decision: String)

  /** [[evaluate]]'s text-protocol sibling: decisions computed from the
    * actual robots.txt BYTES. The per-host files broadcast (a rule set
    * is tiny next to any URL table); each partition parses a host's
    * file once through a local cache, then every URL row is one
    * in-memory longest-match scan — map-only after the broadcast join,
    * no shuffle, no skew beyond host popularity. Preference packs as
    * `len(pattern)·2 + allowFlag` (length counts `*`/`$` as written —
    * the de-facto octet-length rule), so one integer max IS
    * longest-match-wins-tie-allows; no rule → allow with matched_len 0.
    */
  def evaluateTxt(urls: DataFrame, robots: DataFrame, agent: String = "graftbot"): Dataset[TxtDecision] = {
    val spark = urls.sparkSession
    import spark.implicits._
    val r = robots.select(col("host").as("r_host"), col("robots_txt"))
    urls
      .select(col("doc_id").cast("long"), col("host").cast("string"), col("path").cast("string"))
      .join(broadcast(r), col("host") === col("r_host"), "left")
      .select(col("doc_id"), col("host"), col("path"), col("robots_txt"))
      .as[(Long, String, String, String)]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap.empty[String, Array[(Boolean, String)]]
        it.map { case (id, host, path, txt) =>
          val rules =
            if (txt == null) Array.empty[(Boolean, String)]
            else cache.getOrElseUpdate(host, parseRobotsTxt(txt, agent))
          var best = -1L
          var i = 0
          while (i < rules.length) {
            val (allow, pat) = rules(i)
            if (patternMatches(pat, path)) {
              val score = pat.length.toLong * 2 + (if (allow) 1 else 0)
              if (score > best) best = score
            }
            i += 1
          }
          if (best < 0) TxtDecision(id, host, path, 0L, "allow")
          else TxtDecision(id, host, path, best / 2, if (best % 2 == 1) "allow" else "disallow")
        }
      }
  }

  /** Longest-match evaluation of `urls` (doc_id, host, path) against
    * `rules` (host, rule_type, prefix). Output: one row per URL with the
    * matched prefix length (0 = no rule applied) and the decision.
    */
  def evaluate(urls: DataFrame, rules: DataFrame): DataFrame = {
    val r = rules.select(
      col("host").as("r_host"),
      (length(col("prefix")) * 2 +
        when(col("rule_type") === "allow", 1).otherwise(0)).cast("long").as("score"),
      col("prefix"))
    urls
      .join(broadcast(r),
        col("host") === col("r_host") && col("path").startsWith(col("prefix")), "left")
      .groupBy(col("doc_id"), col("host"), col("path"))
      .agg(max(col("score")).as("best"))
      .select(
        col("doc_id"), col("host"), col("path"),
        coalesce(expr("best DIV 2"), lit(0L)).as("matched_len"),
        when(col("best").isNull || col("best") % 2 === 1, "allow")
          .otherwise("disallow").as("decision"))
  }

  final case class FetchSlot(host: String, doc_id: Long, path: String,
      delay_s: Long, rank: Long, fetch_at: Long)

  /** Politeness scheduling — the step between admission and fetching: the
    * robots-ALLOWED URLs of each host are laid out on that host's fetch
    * timeline, one slot every Crawl-delay seconds (`fetch_at = rank ·
    * delay`, rank 0-based over a deterministic per-host order: path
    * BYTES then doc id — UTF-8 byte order so any engine agrees). Hosts
    * without a delay directive schedule everything at 0 (rank still
    * orders the queue). Plan shape: the admission decisions are the
    * map-only [[evaluateTxt]] pass; per-host delays are a second tiny
    * broadcast (one row per host — a crawler holds every host's policy
    * in memory today); the ONLY frontier-scale shuffle is the per-host
    * rank, a window partitioned exactly how a real fetch scheduler
    * shards its queues. At 100 TB the host is the natural unit: no
    * global sort, no cross-host coordination, skew bounded by the
    * biggest single host's URL count — which is what politeness
    * serializes anyway.
    */
  def schedule(urls: DataFrame, robots: DataFrame, agent: String = "graftbot"): Dataset[FetchSlot] = {
    val spark = urls.sparkSession
    import spark.implicits._
    val delays = robots.select(col("host").cast("string"), col("robots_txt").cast("string"))
      .as[(String, String)]
      .map { case (h, txt) => (h, parseCrawlDelay(txt, agent)) }
      .toDF("d_host", "delay_s")
    val admitted = evaluateTxt(urls, robots, agent).toDF()
      .filter(col("decision") === "allow")
      .join(broadcast(delays), col("host") === col("d_host"), "left")
      .select(col("host"), col("doc_id"), col("path"),
        coalesce(col("delay_s"), lit(0L)).as("delay_s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(encode(col("path"), "UTF-8"), col("doc_id"))
    admitted
      .withColumn("rank", row_number().over(w).cast("long") - 1L)
      .withColumn("fetch_at", col("rank") * col("delay_s"))
      .as[FetchSlot]
  }
}
