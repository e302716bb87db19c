package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SitemapsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("unescapeXml: named and numeric entities; bare ampersands are malformed") {
    assert(Sitemaps.unescapeXml("a&amp;b&lt;c&gt;d&quot;e&apos;f") == "a&b<c>d\"e'f")
    assert(Sitemaps.unescapeXml("x&#65;y&#x42;z") == "xAyBz")
    assert(Sitemaps.unescapeXml("no entities") == "no entities")
    assert(Sitemaps.unescapeXml("&#x1F600;") == new String(Character.toChars(0x1F600)))
    def bad(s: String) = intercept[Sitemaps.MalformedSitemap](Sitemaps.unescapeXml(s))
    bad("broken & alone;not-an-entity-then-truncated &")
    bad("&unknown;")
    bad("&#;")
    bad("&#xZZ;")
    bad("&#0;")
  }

  test("parseLeaves: declaration, comments, CDATA, attributes, nesting, strictness") {
    val leaves = Sitemaps.parseLeaves(
      "<?xml version=\"1.0\"?>\n<!-- c -->\n" +
        "<root xmlns=\"urn:x\">\n  <a>one</a>\n  <b><c>two&amp;half</c></b>\n" +
        "  <d><![CDATA[raw & <unescaped>]]></d>\n  <e/>\n</root>\n")
    assert(leaves == Vector(("root/a", "one"), ("root/b/c", "two&half"),
      ("root/d", "raw & <unescaped>")))
    def bad(s: String) = intercept[Sitemaps.MalformedSitemap](Sitemaps.parseLeaves(s))
    bad("<a><b></a></b>") // mismatched close
    bad("<a>text<b>mixed</b></a>") // mixed content outside the profile
    bad("<a></a><b></b>") // two roots
    bad("<a>") // unclosed
    bad("text only")
    bad("<a><!-- unterminated </a>")
    bad("<a><![CDATA[unterminated</a>")
  }

  test("end-to-end: encode + extract recovers every URL with shard, order, and decoding") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val u = Url.normalize(Url.attachUrls(docs)).toDF().select("doc_id", "host", "path")
    val src = u.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val files = Sitemaps.encodeSitemaps(u)
    // both children exist per host; shard 1 is genuinely gzipped
    val names = files.collect().map(r => (r.getString(0), r.getString(1), r.getAs[Array[Byte]](2)))
    val hosts = names.map(_._1).distinct
    hosts.foreach { h =>
      val f = names.filter(_._1 == h).map(n => n._2 -> n._3).toMap
      assert(f.keySet == Set("sitemap.xml", "sitemap-0.xml", "sitemap-1.xml.gz"))
      assert((f("sitemap-1.xml.gz")(0) & 0xff) == 0x1f && (f("sitemap-1.xml.gz")(1) & 0xff) == 0x8b)
    }
    val got = Sitemaps.sitemapExtract(files).collect()
    val want = src.groupBy(t => (t._2, t._1 % 2)).toSeq.flatMap { case ((host, shard), ds) =>
      ds.sortBy(_._1).zipWithIndex.map { case ((id, _, path), ord) =>
        Sitemaps.SitemapEntry(host, shard, ord.toLong,
          s"https://$host$path" + (if (id % 5 == 0) "?a=1&b=2" else ""),
          f"2026-01-${1 + id % 28}%02d")
      }.toSeq
    }.toSet
    assert(got.length == 200 && got.toSet == want)
    // partition-stable
    val again = Sitemaps.sitemapExtract(
      Sitemaps.encodeSitemaps(u.repartition(7))).collect().toSet
    assert(again == got.toSet)
  }

  test("damage and strictness: one bad byte or an unreferenced child drops the whole host") {
    import spark.implicits._
    val docs = (0L until 60L).toDF("doc_id")
    val u = Url.normalize(Url.attachUrls(docs)).toDF().select("doc_id", "host", "path")
    val files = Sitemaps.encodeSitemaps(u).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Array[Byte]](2)))
    val victim = files.find(_._2 == "sitemap-1.xml.gz").get._1
    val clean = Sitemaps.sitemapExtract(files.toSeq.toDF("host", "file_name", "payload")).collect()
    assert(clean.nonEmpty && clean.exists(_.host == victim))
    // flip one byte inside the victim's gzip child: CRC fails, host drops
    val corrupted = files.map {
      case (h, n, p) if h == victim && n == "sitemap-1.xml.gz" =>
        val q = p.clone(); q(q.length / 2) = (q(q.length / 2) ^ 0x20).toByte; (h, n, q)
      case f => f
    }
    val afterCorrupt = Sitemaps.sitemapExtract(corrupted.toSeq.toDF("host", "file_name", "payload")).collect()
    assert(afterCorrupt.forall(_.host != victim), "damaged host must vanish entirely")
    assert(afterCorrupt.map(_.host).toSet == clean.map(_.host).toSet - victim, "other hosts survive")
    // an extra file the index never referenced is a strictness violation
    val extra = files :+ ((victim, "rogue.xml", "<urlset></urlset>".getBytes("UTF-8")))
    val afterExtra = Sitemaps.sitemapExtract(extra.toSeq.toDF("host", "file_name", "payload")).collect()
    assert(afterExtra.forall(_.host != victim))
    // a missing referenced child likewise
    val missing = files.filterNot(f => f._1 == victim && f._2 == "sitemap-0.xml")
    val afterMissing = Sitemaps.sitemapExtract(missing.toSeq.toDF("host", "file_name", "payload")).collect()
    assert(afterMissing.forall(_.host != victim))
  }
}
