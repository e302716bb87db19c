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
}
