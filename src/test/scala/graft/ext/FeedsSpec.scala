package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FeedsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // ------------------------------------------------------------- dates

  test("daysFromCivil matches java.time across two centuries") {
    val rnd = new scala.util.Random(1)
    for (_ <- 0 until 500) {
      val y = 1900 + rnd.nextInt(200)
      val m = 1 + rnd.nextInt(12)
      val d = 1 + rnd.nextInt(28)
      assert(Feeds.daysFromCivil(y, m, d) == java.time.LocalDate.of(y, m, d).toEpochDay,
        s"$y-$m-$d")
    }
  }

  test("RFC 822 parser: zones, case, and malformed forms") {
    def j(s: String) = java.time.ZonedDateTime
      .parse(s, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME).toEpochSecond
    val ok = Seq(
      "Thu, 05 Feb 2026 10:30:00 GMT",
      "Mon, 01 Jan 2024 00:00:00 +0000",
      "Sat, 28 Mar 2026 23:59:59 +0530",
      "Sun, 15 Nov 2020 12:00:01 -0800")
    ok.foreach(s => assert(Feeds.parseRfc822(s) == j(s), s))
    // weekday is redundant and ignored — even when wrong
    assert(Feeds.parseRfc822("Xxx, 05 Feb 2026 10:30:00 GMT") ==
      Feeds.parseRfc822("Thu, 05 Feb 2026 10:30:00 GMT"))
    Seq("05 Feb 2026 10:30 GMT", "Thu, 05 Xxx 2026 10:30:00 GMT",
      "Thu, 05 Feb 2026 10:30:00", "Thu, 05 Feb 2026 25:30:00 GMT",
      "Thu, 05 Feb 2026 10:30:00 EST5").foreach { s =>
      intercept[RuntimeException](Feeds.parseRfc822(s))
    }
  }

  test("RFC 3339 parser: zones, fractions, and malformed forms") {
    def j(s: String) = java.time.OffsetDateTime.parse(s).toEpochSecond
    val ok = Seq(
      "2026-02-05T10:30:00Z",
      "2024-01-01T00:00:00+00:00",
      "2026-03-28T23:59:59+05:30",
      "2020-11-15T12:00:01-08:00",
      "2026-02-05T10:30:00.123Z")
    ok.foreach(s => assert(Feeds.parseRfc3339(s) == j(s), s))
    Seq("2026-02-05 10:30:00Z", "2026-13-05T10:30:00Z", "2026-02-05T10:30:00",
      "2026-02-05T10:30:00+0530", "2026-02-05T10:30:00Zx").foreach { s =>
      intercept[RuntimeException](Feeds.parseRfc3339(s))
    }
  }

  // ------------------------------------------------------- end to end

  private def urlsDf(n: Long) = {
    import spark.implicits._
    (0L until n).map(i => (i, s"host${i % 3}.example", s"/p/$i")).toDF("doc_id", "host", "path")
  }

  test("feed pair round-trips: both dialects, CDATA/entity/zone hazards, document order") {
    val files = Feeds.encodeFeeds(urlsDf(60))
    val entries = Feeds.feedExtract(files).collect()
    assert(entries.length == 60)
    assert(entries.count(_.dialect == "rss") == 30 && entries.count(_.dialect == "atom") == 30)
    entries.foreach { e =>
      val id = e.guid.split(':').last.toLong
      assert(e.link.startsWith(s"https://host${id % 3}.example/p/$id"), e)
      if (id % 5 == 0) assert(e.link.endsWith("?a=1&b=2"), s"entity-decoded query: $e")
      assert(e.dialect == (if (id % 2 == 0) "rss" else "atom"))
      // replay the epoch closed-form
      val cum = Array(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)
      val off = (id % 4) match { case 2 => 19800L; case 3 => -28800L; case _ => 0L }
      val want = 1767225600L + cum((id % 12).toInt) * 86400L + (id % 28) * 86400L +
        (id % 24) * 3600L + (id % 60) * 60L - off
      assert(e.published == want, s"epoch for doc $id")
    }
    // ordinals are dense per (host, dialect) in doc order
    entries.groupBy(e => (e.host, e.dialect)).foreach { case (_, g) =>
      assert(g.map(_.ord).sorted.sameElements(g.indices.map(_.toLong)))
    }
  }

  test("damage quarantines the whole host, not the whole corpus") {
    import spark.implicits._
    val files = Feeds.encodeFeeds(urlsDf(60)).as[(String, String, Array[Byte])].collect()
    val damaged = files.map { case (h, n, p) =>
      if (h == "host1.example" && n == "feed.rss") {
        val s = new String(p, "UTF-8").replace("</item>", "</itme>") // mismatched close
        (h, n, s.getBytes("UTF-8"))
      } else (h, n, p)
    }
    val left = Feeds.feedExtract(damaged.toSeq.toDF("host", "file_name", "payload")).collect()
    assert(left.forall(_.host != "host1.example"))
    assert(left.map(_.host).toSet == Set("host0.example", "host2.example"))
    // a missing file also drops its host whole
    val partial = files.filterNot { case (h, n, _) => h == "host2.example" && n == "feed.atom" }
    val left2 = Feeds.feedExtract(partial.toSeq.toDF("host", "file_name", "payload")).collect()
    assert(left2.forall(_.host != "host2.example"))
  }

  test("attribute capture: quoting styles, entities in values, malformed attrs fail") {
    val xml = """<r a="one" b='two' c="x &amp; y"><e k="v"/></r>"""
    val leaves = Sitemaps.parseLeaves(xml, withAttrs = true)
    assert(leaves == Vector(("r@a", "one"), ("r@b", "two"), ("r@c", "x & y"), ("r/e@k", "v")))
    // default profile still ignores attributes entirely
    assert(Sitemaps.parseLeaves(xml).isEmpty)
    Seq("""<r a=one></r>""", """<r a></r>""", """<r a="x></r>""").foreach { bad =>
      intercept[RuntimeException](Sitemaps.parseLeaves(bad, withAttrs = true))
    }
  }
}
