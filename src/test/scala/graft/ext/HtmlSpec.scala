package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class HtmlSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def checksum(s: String): Long = {
    var c = 0L
    s.getBytes(UTF_8).foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
    c
  }

  test("writer->extractor is the identity on hostile texts") {
    val texts = Seq(
      "plain words here",
      "a < b && c > d",                       // mandatory escapes
      "literal &amp; is text, &#xZZ; too",    // entity-shaped source text
      "quotes \" and ' everywhere",
      "emoji 😀 and astral 𐐷 pass through",
      "",                                     // empty doc
      "&&&<<<>>>",
      "tab\tand\nnewline survive"
    )
    texts.zipWithIndex.foreach { case (t, i) =>
      (0L until 25L by 7L).foreach { id =>
        val html = Html.toHtml(id + i, t)
        assert(Html.extractText(html) == t, s"id=${id + i} text='$t'\nhtml=$html")
      }
    }
  }

  test("script/style/comment content is never extracted") {
    val html = "<html><body>A<script>var x = \"<b>no</b>\";</script>B" +
      "<style>q{content:'<i>no</i>'}</style>C<!-- <u>no</u> -->D" +
      "<SCRIPT>ALSO_NO</script>E</body></html>"
    assert(Html.extractText(html) == "ABCDE")
  }

  test("quoted '>' inside attributes does not close the tag") {
    assert(Html.extractText("""x<a href="u?q=>v" title='>'>y</a>z""") == "xyz")
  }

  test("entities decode; invalid references pass through literally") {
    assert(Html.extractText("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'")
    assert(Html.extractText("&#65;&#x42;&#x1F600;") == "A" + "B" + new String(Character.toChars(0x1F600)))
    assert(Html.extractText("&bogus; &#; &#xD800; & alone") == "&bogus; &#; &#xD800; & alone")
  }

  test("unterminated constructs consume to EOF without leaking text") {
    assert(Html.extractText("ok<!-- never closed ...") == "ok")
    assert(Html.extractText("ok<script>var x=1;") == "ok")
    assert(Html.extractText("ok<div attr=\"unterminated") == "ok")
  }

  test("end-to-end over a corpus: extracted stats equal source-text stats") {
    val docs = (0 until 80).map(i => (i.toLong, s"doc $i <tag> & body " + ("w " * (i % 11)))).toDF("doc_id", "text")
    val expected = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Html.htmlTextStats(Html.encodeHtmlDocs(docs)).collect()
    assert(out.length == 80)
    out.foreach { h =>
      val t = expected(h.doc_id)
      assert(h.n_bytes == t.getBytes(UTF_8).length.toLong, s"doc ${h.doc_id}")
      assert(h.checksum == checksum(t), s"doc ${h.doc_id}")
    }
    val plan = Html.htmlTextStats(Html.encodeHtmlDocs(docs)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "map-only plan")
  }

  test("extractLinks: quote variants, uppercase tags, entity decode, relative resolution") {
    val html = "<body>" +
      "<a href=\"https://x.example/p?a=1&amp;b=2\">d</a>" + // double-quoted + entity
      "<a href='https://y.example/q'>s</a>" + // single-quoted
      "<a href=/rel/3>u</a>" + // unquoted, root-relative
      "<A HREF=\"https://z.example/\">up</A>" + // uppercase tag + attr
      "</body>"
    assert(Html.extractLinks(html, "base.example").map(_._2) == Seq(
      "https://x.example/p?a=1&b=2",
      "https://y.example/q",
      "https://base.example/rel/3",
      "https://z.example/"))
  }

  test("extractLinks ignores every decoy class a regex scraper trips over") {
    val html = "<body>" +
      "<script>var l=\"<a href=\\\"https://evil.example/s\\\">x</a>\";</script>" +
      "<!-- <a href=\"https://evil.example/c\">x</a> -->" +
      "<a id=\"noref\">bare</a>" +
      "<a href=\"\">empty</a>" +
      "<style>.x{background:url('<a href=https://evil.example/y>')}</style>" +
      "<a href=\"https://ok.example/1\">real</a>" +
      "</body>"
    assert(Html.extractLinks(html, "b.example") == Seq((1, "https://ok.example/1")))
  }

  test("linked-page round trip: extracted links equal the planted closed-form set") {
    val docs = (0 until 60).map(i => (i.toLong, s"body $i <x> & text")).toDF("doc_id", "text")
    val got = Html.pageLinks(Html.encodeLinkedDocs(docs)).collect()
      .map(l => (l.doc_id, l.link_idx, l.url, l.host)).toSet
    val want = (0 until 60).flatMap { id =>
      (1 to Html.linkCount(id.toLong)).map { j =>
        val url = Html.linkUrl(id.toLong, j)
        val host = url.stripPrefix("https://").takeWhile(_ != '/')
        (id.toLong, j.toLong, url, host)
      }
    }.toSet
    assert(got == want)
    // text extraction over the LINKED pages still recovers anchor/decoy-free text?
    // anchors contribute their visible text ("link j" / decoy text) by design —
    // the htmlTextStats gate runs on the link-free encodeHtmlDocs fixture.
  }

  test("hostLinkEdges: edge counts aggregate per (src, dst) host pair") {
    val docs = Seq((8L, "t")).toDF("doc_id", "text") // id 8: src0, links j=1 ch
    val edges = Html.hostLinkEdges(Html.encodeLinkedDocs(docs)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = (1 to Html.linkCount(8L)).map { j =>
      val host = Html.linkUrl(8L, j).stripPrefix("https://").takeWhile(_ != '/')
      ("src0.example", host)
    }.groupBy(identity).map { case ((s, d), xs) => (s, d, xs.size.toLong) }.toSet
    assert(edges == want)
  }
}
