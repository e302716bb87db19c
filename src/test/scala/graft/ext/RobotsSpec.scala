package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RobotsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def urls(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "host", "path")
  }

  private def rules(rows: (String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("host", "rule_type", "prefix")
  }

  test("evaluate: longest match wins, ties go to allow, no match allows") {
    val r = rules(
      ("h.io", "disallow", "/private"),
      ("h.io", "allow", "/private/ok"),
      ("h.io", "disallow", "/priv"), // shorter than /private: must lose on /private/*
      ("h.io", "allow", "/tie"),
      ("h.io", "disallow", "/tie")) // exact tie: allow wins
    val got = Robots.evaluate(urls(
      (1L, "h.io", "/private/secret"), // /private (disallow) beats /priv
      (2L, "h.io", "/private/ok/file"), // deeper allow overrides
      (3L, "h.io", "/public/page"), // nothing matches
      (4L, "h.io", "/tie/x")), r) // equal-length allow + disallow
      .collect().map(x => x.getLong(0) -> ((x.getLong(3), x.getString(4)))).toMap
    assert(got(1L) == ((8L, "disallow")))
    assert(got(2L) == ((11L, "allow")))
    assert(got(3L) == ((0L, "allow")))
    assert(got(4L) == ((4L, "allow")))
  }

  test("evaluate: hosts are isolated; a rule never leaks across hosts") {
    val r = rules(("a.io", "disallow", "/x"))
    val got = Robots.evaluate(urls((1L, "a.io", "/x/1"), (2L, "b.io", "/x/1")), r)
      .collect().map(x => x.getLong(0) -> x.getString(4)).toMap
    assert(got(1L) == "disallow" && got(2L) == "allow")
  }

  test("rulesFor: deterministic, three rules per host, allow nested under the first disallow") {
    import spark.implicits._
    val hosts = Seq("alpha.example.com", "beta.testsite.io").toDF("host")
    val r1 = Robots.rulesFor(hosts).collect().toSet
    val r2 = Robots.rulesFor(hosts).collect().toSet
    assert(r1 == r2)
    Seq("alpha.example.com", "beta.testsite.io").foreach { h =>
      val hr = r1.filter(_.host == h)
      assert(hr.size == 3)
      val dis = hr.filter(_.rule_type == "disallow").map(_.prefix)
      val all = hr.filter(_.rule_type == "allow").map(_.prefix)
      assert(all.size == 1 && dis.size == 2)
      assert(all.head.startsWith(dis.minBy(_.length)), "allow override nests under the 1-segment disallow")
    }
  }

  test("patternMatches: RFC 9309 wildcard truth table") {
    val m = Robots.patternMatches _
    // plain prefix
    assert(m("/data", "/data/x") && m("/data", "/data") && !m("/data", "/dat"))
    assert(!m("/data", "/files/data"))
    // * matches any run, including empty
    assert(m("/*/private", "/a/private/x") && m("/*/private", "//private"))
    assert(m("/d*a", "/da") && m("/d*a", "/dxxxa/more") && !m("/d*a", "/dxxxb"))
    // trailing $ anchors; embedded $ is literal
    assert(m("/exact$", "/exact") && !m("/exact$", "/exactly"))
    assert(m("/*7$", "/a/b7") && !m("/*7$", "/a/b71") && !m("/*7$", "/a/b8"))
    assert(m("/a$b", "/a$b/c") && !m("/a$b", "/ab"))
    // star backtracking: first candidate fails, later one succeeds
    assert(m("/*ab$", "/abab") && !m("/*ab$", "/aba"))
    // multiple stars
    assert(m("/*/x/*/y", "/1/x/2/y-tail") && !m("/*/x/*/y", "/1/x/2/z"))
  }

  test("parseRobotsTxt: group selection, stacking, hazards, empty patterns") {
    val txt =
      "# comment only\r\n" +
      "Sitemap: https://h/s.xml\n" +
      "Disallow: /orphan-before-any-group\n" + // no group yet: dropped
      "\n" +
      "User-agent: *\n" +
      "Crawl-delay: 5\n" +
      "Disallow: /star\n" +
      "\n" + // blank line must NOT end the group
      "Allow: /star/ok  # trailing comment\n" +
      "disallow:/nospace\n" +
      "Disallow:\n" + // empty pattern: ignored
      "User-Agent: GraftBot\n" +
      "User-agent: otherbot\n" +
      "Disallow: /gb\n"
    // graftbot (case-insensitive) selects the stacked group, NOT *
    assert(Robots.parseRobotsTxt(txt, "GRAFTBOT").toSeq == Seq((false, "/gb")))
    assert(Robots.parseRobotsTxt(txt, "otherbot").toSeq == Seq((false, "/gb")))
    // unknown agent falls back to the * group; blank line kept it open
    assert(Robots.parseRobotsTxt(txt, "randombot").toSeq ==
      Seq((false, "/star"), (true, "/star/ok"), (false, "/nospace")))
    // two groups naming the same agent merge
    val two = "User-agent: a\nDisallow: /1\nUser-agent: b\nDisallow: /2\nUser-agent: a\nAllow: /3\n"
    assert(Robots.parseRobotsTxt(two, "a").toSeq == Seq((false, "/1"), (true, "/3")))
    // no groups at all -> no rules -> default allow downstream
    assert(Robots.parseRobotsTxt("# empty\n", "x").isEmpty)
  }

  test("evaluateTxt: text-protocol decisions match the structured evaluator's semantics") {
    import spark.implicits._
    val robots = Seq(
      ("h.io", "User-agent: *\nDisallow: /private\nAllow: /private/ok\nDisallow: /*9$\n"),
      ("g.io", "User-agent: *\nDisallow: /all\nUser-agent: graftbot\nAllow: /all\nDisallow: /all/secret$\n"))
      .toDF("host", "robots_txt")
    val got = Robots.evaluateTxt(urls(
      (1L, "h.io", "/private/secret"),   // dir disallow
      (2L, "h.io", "/private/ok/file"),  // deeper allow overrides
      (3L, "h.io", "/public/page9"),     // wildcard $ disallow, len 4
      (4L, "h.io", "/nothing"),          // default allow
      (5L, "g.io", "/all/page"),         // graftbot group allow overrides * disallow
      (6L, "g.io", "/all/secret"),       // anchored disallow wins inside graftbot group
      (7L, "g.io", "/all/secrets"),      // anchor must NOT match the longer path
      (8L, "x.io", "/no/robots")), robots) // host without a file: allow
      .collect().map(x => x.doc_id -> ((x.matched_len, x.decision))).toMap
    assert(got(1L) == ((8L, "disallow")))
    assert(got(2L) == ((11L, "allow")))
    assert(got(3L) == ((4L, "disallow")))
    assert(got(4L) == ((0L, "allow")))
    assert(got(5L) == ((4L, "allow")))
    assert(got(6L) == ((12L, "disallow")))
    assert(got(7L) == ((4L, "allow")))
    assert(got(8L) == ((0L, "allow")))
  }

  test("encodeRobotsTxt + evaluateTxt: end-to-end over the URL fixture, partition-stable") {
    import spark.implicits._
    val docs = (0L until 400L).toDF("doc_id")
    val u = Url.normalize(Url.attachUrls(docs)).toDF().select("doc_id", "host", "path")
    val robots = Robots.encodeRobotsTxt(u)
    // both serializations occur (CRLF parity) and GraftBot groups exist on some hosts
    val txts = robots.collect().map(_.getString(1))
    assert(txts.exists(_.contains("\r\n")) && txts.exists(t => !t.contains("\r\n")))
    assert(txts.exists(_.contains("User-Agent: GraftBot")) && txts.exists(t => !t.contains("GraftBot")))
    val out = Robots.evaluateTxt(u, robots).collect().map(d => (d.doc_id, d.matched_len, d.decision))
    assert(out.length == 400)
    assert(out.exists(_._3 == "disallow") && out.exists(_._3 == "allow"))
    assert(out.exists(o => o._2 == 4L), "a wildcard rule decides somewhere")
    assert(out.exists(o => o._2 > 4L && o._3 == "allow"), "a directory allow-override decides somewhere")
    val again = Robots.evaluateTxt(u.repartition(13), robots).collect()
      .map(d => (d.doc_id, d.matched_len, d.decision))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("end-to-end over the URL fixture: every decision arm occurs and is partition-stable") {
    import spark.implicits._
    val docs = (0L until 300L).toDF("doc_id")
    val u = Url.normalize(Url.attachUrls(docs)).toDF().select("doc_id", "host", "path")
    val r = Robots.rulesFor(u).toDF()
    val out = Robots.evaluate(u, r).collect()
      .map(x => (x.getLong(0), x.getLong(3), x.getString(4)))
    assert(out.length == 300)
    assert(out.exists(_._3 == "disallow") && out.exists(_._3 == "allow"))
    assert(out.exists(o => o._2 == 0L && o._3 == "allow"), "no-match arm")
    assert(out.exists(o => o._2 > 0L && o._3 == "allow"), "allow-override arm")
    val again = Robots.evaluate(u.repartition(13), r).collect()
      .map(x => (x.getLong(0), x.getLong(3), x.getString(4)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("parseCrawlDelay: group selection, last-wins, value hygiene") {
    // named group's delay REPLACES *'s (selection, not merge)
    val txt =
      "User-agent: *\nCrawl-delay: 5\nDisallow: /a\n\n" +
      "User-agent: graftbot\ncrawl-delay: 2\nDisallow: /b\n"
    assert(Robots.parseCrawlDelay(txt, "graftbot") == 2L)
    assert(Robots.parseCrawlDelay(txt, "randombot") == 5L)
    // no directive anywhere -> 0
    assert(Robots.parseCrawlDelay("User-agent: *\nDisallow: /x\n", "a") == 0L)
    // last declared delay among the chosen groups wins
    val twice = "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 7\nDisallow: /x\n"
    assert(Robots.parseCrawlDelay(twice, "a") == 7L)
    // merged same-agent groups: later group's delay wins too
    val merged = "User-agent: a\nCrawl-delay: 1\nDisallow: /1\n\n" +
      "User-agent: a\nCrawl-delay: 9\nDisallow: /2\n"
    assert(Robots.parseCrawlDelay(merged, "a") == 9L)
    // hygiene: fractions, units, negatives, empties, and >6-digit values
    // are ignored (treated as absent), falling back to an earlier value
    for (bad <- Seq("0.5", "10s", "-3", "", "10000000"))
      assert(Robots.parseCrawlDelay(
        s"User-agent: *\nCrawl-delay: 4\nCrawl-delay: $bad\nDisallow: /x\n", "a") == 4L,
        s"value '$bad' must be ignored")
    // a GraftBot group with rules but NO delay: selection still replaces
    // * wholesale -> 0, never *'s 5
    val noDelay = "User-agent: *\nCrawl-delay: 5\nDisallow: /a\n\n" +
      "User-agent: graftbot\nDisallow: /b\n"
    assert(Robots.parseCrawlDelay(noDelay, "graftbot") == 0L)
    // crawl-delay must NOT leak into the rule list
    assert(Robots.parseRobotsTxt(txt, "graftbot").toSeq == Seq((false, "/b")))
  }

  test("schedule: per-host timelines honor the delay; disallowed URLs never scheduled") {
    import spark.implicits._
    val robots = Seq(
      ("h.io", "User-agent: *\nCrawl-delay: 5\nDisallow: /private\n"),
      ("g.io", "User-agent: *\nCrawl-delay: 2\nUser-agent: graftbot\nCrawl-delay: 3\nDisallow: /b\n"))
      .toDF("host", "robots_txt")
    val u = urls(
      (1L, "h.io", "/a"), (2L, "h.io", "/b"), (3L, "h.io", "/private/x"),
      (4L, "g.io", "/a"), (5L, "g.io", "/b"), (6L, "g.io", "/c"),
      (7L, "x.io", "/no/robots"), (8L, "x.io", "/also"))
    val got = Robots.schedule(u, robots).collect().map(s =>
      s.doc_id -> ((s.delay_s, s.rank, s.fetch_at))).toMap
    // h.io: /private/x excluded; /a then /b at 5s spacing
    assert(!got.contains(3L))
    assert(got(1L) == ((5L, 0L, 0L)) && got(2L) == ((5L, 1L, 5L)))
    // g.io: graftbot group selected (delay 3, disallow /b)
    assert(!got.contains(5L))
    assert(got(4L) == ((3L, 0L, 0L)) && got(6L) == ((3L, 1L, 3L)))
    // x.io has no robots file: all allowed, delay 0, everything at t=0
    assert(got(8L) == ((0L, 0L, 0L)) && got(7L) == ((0L, 1L, 0L)))
  }

  test("schedule: end-to-end over the URL fixture — spacing law, admission consistency, partition-stable") {
    import spark.implicits._
    val docs = (0L until 400L).toDF("doc_id")
    val u = Url.normalize(Url.attachUrls(docs)).toDF().select("doc_id", "host", "path")
    val robots = Robots.encodeRobotsTxt(u)
    val slots = Robots.schedule(u, robots).collect()
    // exactly the allowed set is scheduled
    val allowed = Robots.evaluateTxt(u, robots).collect()
      .filter(_.decision == "allow").map(_.doc_id).toSet
    assert(slots.map(_.doc_id).toSet == allowed)
    // per host: delays uniform, ranks dense from 0, fetch_at = rank * delay,
    // and the order is (path bytes, doc_id)
    slots.groupBy(_.host).foreach { case (host, hs) =>
      assert(hs.map(_.delay_s).distinct.length == 1, s"$host: one delay per host")
      val d = hs.head.delay_s
      assert(d >= 1 && d <= 9, s"$host: fixture delay in 1..9")
      assert(hs.map(_.rank).sorted.toSeq == (0L until hs.length).toSeq, s"$host: dense ranks")
      hs.foreach(s => assert(s.fetch_at == s.rank * d))
      val byRank = hs.sortBy(_.rank).map(s => (s.path, s.doc_id)).toSeq
      val expected = hs.map(s => (s.path, s.doc_id)).toSeq
        .sortBy { case (p, id) => (p, id) } // ASCII paths: string order == byte order
      assert(byRank == expected, s"$host: rank order is (path, doc_id)")
    }
    // both the * arm and the GraftBot arm of the delay fixture occur
    val delays = slots.groupBy(_.host).map { case (h, hs) => (h, hs.head.delay_s) }
    assert(delays.values.toSet.size > 1, "delays vary across hosts")
    val again = Robots.schedule(u.repartition(13), robots).collect()
      .map(s => (s.doc_id, s.rank, s.fetch_at)).sortBy(_._1)
    assert(again.toSeq == slots.map(s => (s.doc_id, s.rank, s.fetch_at)).sortBy(_._1).toSeq)
  }
}
