package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CdxSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def archives(n: Long) = {
    import spark.implicits._
    Archives.encodeWarcArchives(
      (0L until n).map(id => (id, s"cdx body $id " + ("m" * (id % 17).toInt))).toDF("doc_id", "text"),
      nArchives = 4)
  }

  test("cdxIndex: offsets and lengths tile each segment exactly; fields are closed-form") {
    import spark.implicits._
    val segs = archives(20L)
    val blobs = segs.as[(Long, Array[Byte])].collect().toMap
    val rows = Archives.cdxIndex(segs).collect()
    assert(rows.length == 20)
    rows.groupBy(_.archive_id).foreach { case (aid, rs) =>
      val sorted = rs.sortBy(_.rec_idx)
      // members tile the segment: each offset is the previous member's end
      var expect = 0L
      sorted.foreach { r =>
        assert(r.offset == expect, s"archive $aid rec ${r.rec_idx} offset")
        expect += r.length
      }
      assert(expect == blobs(aid).length, s"archive $aid total length")
    }
    rows.foreach { r =>
      assert(r.urlkey == s"com,example)/doc/${r.rec_doc_id}")
      val body = s"cdx body ${r.rec_doc_id} " + ("m" * (r.rec_doc_id % 17).toInt)
      assert(r.n_bytes == body.getBytes("UTF-8").length)
    }
  }

  test("cdxSeek: random access reproduces warcExtract bitwise; bad offsets drop rows") {
    import spark.implicits._
    val segs = archives(24L)
    val viaSeek = Archives.cdxSeek(segs).collect()
      .map(e => (e.archive_id, e.rec_idx) -> ((e.rec_doc_id, e.content_length, e.checksum))).toMap
    val viaWalk = Archives.warcExtract(segs).collect()
      .map(e => (e.archive_id, e.rec_idx) -> ((e.rec_doc_id, e.content_length, e.checksum))).toMap
    assert(viaSeek == viaWalk && viaSeek.size == 24)
    // a segment with one flipped byte drops whole from the index
    val damaged = segs.as[(Long, Array[Byte])].map { case (aid, p) =>
      if (aid == 2L) (aid, { val m = p.clone(); m(m.length / 3) = (m(m.length / 3) ^ 0x21).toByte; m })
      else (aid, p)
    }.toDF("archive_id", "payload")
    val survivors = Archives.cdxIndex(damaged).collect().map(_.archive_id).distinct.sorted
    assert(survivors.sameElements(Array(0L, 1L, 3L)))
  }

  test("CDXJ line format: foreign Common-Crawl-style lines parse; extras tolerated; damage fails") {
    // a hand-built foreign line with the real index files' quirks: ALL
    // values as JSON strings, extra keys (mime/status/languages), an
    // escaped URL, a deep filename path
    val foreign = """com,example)/path?q=a%20b 20240315120000 {"url": "http://example.com/path?q=a&b", "mime": "text/html", "status": "200", "digest": "WWLJH5E3KQN7DOHQPLXAI4TJ5LHVABBA", "length": "527", "offset": "88193", "languages": "eng", "filename": "crawl-data/CC-MAIN-2024-10/segments/1707947474594.56/warc/CC-MAIN-20240315120000-20240315150000-00000.warc.gz"}"""
    val e = Archives.parseCdxjLine(foreign)
    assert(e.urlkey == "com,example)/path?q=a%20b")
    assert(e.timestamp == "20240315120000")
    assert(e.url == "http://example.com/path?q=a&b") // & decoded
    assert(e.offset == 88193L && e.length == 527L)
    assert(e.digest == "WWLJH5E3KQN7DOHQPLXAI4TJ5LHVABBA")
    assert(e.filename.endsWith("-00000.warc.gz"))
    // writer/parser round trip over OUR index rows
    val rows = Archives.cdxIndex(archives(12L)).collect()
    rows.foreach { r =>
      val entry = Archives.CdxjEntry(r.urlkey, "20240101000000",
        s"http://example.com/doc/${r.rec_doc_id}", r.offset, r.length,
        s"G${r.digest}", s"segments/seg-${r.archive_id}.warc.gz")
      assert(Archives.parseCdxjLine(Archives.cdxjLineOf(entry)) == entry)
    }
    // malformed ladder
    val bad = Seq(
      "nospace", // no fields
      "k 2024031512000 {}", // 13-digit timestamp
      "k 20240315120000 {\"url\": \"u\"}", // required keys missing
      foreign.replace("\"88193\"", "\"-88193\""), // non-numeric offset
      foreign.replace("\"88193\"", "88193"), // non-string value: out of profile
      foreign.replace("\"status\": \"200\", ", "\"status\": \"200\", \"status\": \"301\", "), // dup key
      foreign + "x", // trailing bytes
      foreign.replace("}", "")) // unterminated object
    bad.zipWithIndex.foreach { case (line, i) =>
      intercept[RuntimeException](Archives.parseCdxjLine(line))
    }
  }
}
