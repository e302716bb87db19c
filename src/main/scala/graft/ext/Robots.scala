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
}
