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
}
