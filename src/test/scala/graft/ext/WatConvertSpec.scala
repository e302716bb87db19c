package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class WatConvertSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("titleOf: entity decode, trim, case-insensitive tag, absence and unclosed forms") {
    assert(Html.titleOf("<html><head><title>Plain</title></head></html>") == "Plain")
    assert(Html.titleOf("<TITLE> padded &amp; decoded </TITLE>") == "padded & decoded")
    assert(Html.titleOf("<title lang=\"en\">attr form</title>") == "attr form")
    assert(Html.titleOf("<html><body>no title</body></html>") == "")
    assert(Html.titleOf("<title>unclosed forever") == "")
    assert(Html.titleOf("<titlefoo>not a title</titlefoo>") == "")
    // decoys inside comments and script/style RAWTEXT must not be picked
    // over the real element (same walk as extractLinks)
    assert(Html.titleOf("<!-- <title>decoy</title> --><title>Real</title>") == "Real")
    assert(Html.titleOf("<script>var t=\"<title>decoy</title>\";</script><title>Real</title>") == "Real")
    assert(Html.titleOf("<style>q{content:\"<title>x</title>\"}</style><title>Real</title>") == "Real")
    assert(Html.titleOf("<!-- <title>only a decoy</title> -->") == "")
  }

  test("watConvert: canonical JSON per response record, root-relative links re-based") {
    import spark.implicits._
    val docs = (0L until 12L).map(id => (id, s"body text $id")).toDF("doc_id", "text")
    val linked = Html.encodeLinkedDocs(docs)
      .withColumn("html", org.apache.spark.sql.functions.expr(
        "replace(html, '<title></title>', concat('<title>Doc ', doc_id, ' metadata</title>'))"))
    val wat = Archives.watConvert(
      Archives.encodeWarcHttpArchives(linked, nArchives = 4, textCol = "html"))
    // the WAT output is a real .warc.gz: the standard reader ingests it
    val rows = Archives.warcExtract(wat).collect()
    assert(rows.length == 12)
    // replay the expected JSON for every doc and compare the checksums
    rows.foreach { r =>
      val id = r.rec_doc_id
      val links = (1 to Html.linkCount(id)).map { j =>
        if (j % 2 == 1) Html.linkUrl(id, j)
        else s"https://example.com/r/$j" // re-based on the crawl URI host
      }
      val json = "{\"Container\":{\"Target-URI\":\"http://example.com/doc/" + id + "\"}," +
        "\"Response\":{\"Status\":200,\"Content-Type\":\"text/plain; charset=utf-8\"}," +
        "\"HTML-Metadata\":{\"Title\":\"Doc " + id + " metadata\"," +
        "\"Links\":[" + links.map("\"" + _ + "\"").mkString(",") + "]}}"
      val b = json.getBytes("UTF-8")
      var cs = 0L
      b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
      assert(r.content_length == b.length && r.checksum == cs, s"doc $id")
    }
  }

  test("watConvert: a damaged segment drops whole, clean segments survive") {
    import spark.implicits._
    val docs = (0L until 8L).map(id => (id, s"t$id")).toDF("doc_id", "text")
    val segs = Archives.encodeWarcHttpArchives(Html.encodeLinkedDocs(docs),
      nArchives = 4, textCol = "html")
      .as[(Long, Array[Byte])]
      .map { case (aid, p) =>
        if (aid == 1L) (aid, { val m = p.clone(); m(m.length / 2) = (m(m.length / 2) ^ 0x7f).toByte; m })
        else (aid, p)
      }
      .toDF("archive_id", "payload")
    val out = Archives.warcExtract(Archives.watConvert(segs)).collect()
    assert(out.map(_.archive_id).distinct.sorted.sameElements(Array(0L, 2L, 3L)))
  }

  test("foreign-layout WAT record: CC-style envelope + extra headers + foreign gzip ingests") {
    import spark.implicits._
    // hand-built from another producer's conventions: WARC-Record-ID /
    // WARC-Date / WARC-Warcinfo-ID headers our writer never emits, a
    // different header ORDER, the Common Crawl Envelope JSON nesting, and
    // the member gzipped by java.util.zip (a foreign DEFLATE stream)
    val json = ("""{"Envelope":{"Format":"WARC","WARC-Header-Length":"438",""" +
      """"Payload-Metadata":{"Trailing-Slop-Length":"4","Actual-Content-Type":"application/metadata-fields",""" +
      """"HTTP-Response-Metadata":{"Headers":{"Content-Type":"text/html"},""" +
      """"HTML-Metadata":{"Head":{"Title":"A foreign page"},""" +
      """"Links":[{"path":"A@/href","url":"http://other.example/x"}]}}}}}""").getBytes("UTF-8")
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: metadata\r\n" +
      "WARC-Record-ID: <urn:uuid:3e2b4d61-0000-4a5e-9d2f-77aa0cc00042>\r\n" +
      "WARC-Date: 2024-03-15T12:00:00Z\r\n" +
      "WARC-Warcinfo-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n" +
      "Content-Type: application/json\r\n" +
      s"Content-Length: ${json.length}\r\n" +
      "WARC-Target-URI: http://example.org/page/777\r\n" + // target LAST
      "\r\n").getBytes("UTF-8")
    val rec = head ++ json ++ "\r\n\r\n".getBytes("UTF-8")
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(rec); g.close()
      bos.toByteArray
    }
    val rows = Archives.warcExtract(Seq((9L, gz)).toDF("archive_id", "payload")).collect()
    assert(rows.length == 1)
    val r = rows.head
    var cs = 0L
    json.foreach(b => cs = (cs * 31 + (b & 0xff)) % 1000000007L)
    assert(r.archive_id == 9L && r.rec_doc_id == 777L &&
      r.content_length == json.length.toLong && r.checksum == cs)
  }
}
