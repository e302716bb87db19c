package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TarSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"tar doc $i " + ("pad " * (i % 9)) + s"end$i"))
      .toDF("doc_id", "text")

  private def checksum(s: String): Long = {
    var c = 0L
    s.getBytes(UTF_8).foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
    c
  }

  test("round trip across typeflag/prefix/mtime profiles, plain and gzipped") {
    val d = docs(60)
    val expected = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Seq(false, true).foreach { gz =>
      val enc = Tar.encodeTarArchives(d, nArchives = 4, gzipped = gz)
      val out = (if (gz) Tar.tgzExtract(enc) else Tar.tarExtract(enc)).collect()
      assert(out.length == 60, s"gz=$gz")
      out.foreach { e =>
        val text = expected(e.rec_doc_id)
        assert(e.n_bytes == text.getBytes(UTF_8).length.toLong, s"doc ${e.rec_doc_id} size gz=$gz")
        assert(e.checksum == checksum(text), s"doc ${e.rec_doc_id} content gz=$gz")
      }
    }
  }

  test("our tarballs are valid per commons-compress (writer differential)") {
    val payloads = Tar.encodeTarArchives(docs(40), nArchives = 4)
      .select("archive_id", "payload").as[(Long, Array[Byte])].collect()
    payloads.foreach { case (aid, bytes) =>
      val tin = new TarArchiveInputStream(new java.io.ByteArrayInputStream(bytes))
      var files = 0
      var e = tin.getNextEntry
      while (e != null) {
        if (e.isFile) {
          val name = e.getName
          val base = name.substring(name.lastIndexOf('/') + 1)
          val id = base.stripPrefix("d").stripSuffix(".txt").toLong
          assert(id % 4 == aid)
          val body = new String(tin.readAllBytes(), UTF_8)
          assert(body.startsWith(s"tar doc $id "), s"entry $id")
          if (id % 4 == 1) assert(name == s"dir$id/d$id.txt", "prefix field spliced into the path")
          files += 1
        }
        e = tin.getNextEntry
      }
      assert(files == 10)
      tin.close()
    }
  }

  test("foreign tarballs from commons-compress parse (reader differential)") {
    val texts = (0 until 12).map(i => i.toLong -> (s"foreign tar doc $i " + ("xyz " * i))).toMap
    val bos = new java.io.ByteArrayOutputStream()
    val tos = new TarArchiveOutputStream(bos)
    texts.toSeq.sortBy(_._1).foreach { case (id, t) =>
      val entry = new TarArchiveEntry(s"d$id.txt")
      val b = t.getBytes(UTF_8)
      entry.setSize(b.length.toLong)
      tos.putArchiveEntry(entry)
      tos.write(b)
      tos.closeArchiveEntry()
    }
    tos.close()
    val out = Tar.tarExtract(Seq((3L, bos.toByteArray)).toDF("archive_id", "payload"))
      .collect().sortBy(_.rec_idx)
    assert(out.length == 12)
    out.foreach(e => assert(e.checksum == checksum(texts(e.rec_doc_id))))
  }

  test("damage drops the whole archive; clean archives survive") {
    val payloads = Tar.encodeTarArchives(docs(40), nArchives = 4)
      .select("archive_id", "payload").as[(Long, Array[Byte])].collect().toMap
    def corrupt(b: Array[Byte], at: Int): Array[Byte] = {
      val c = b.clone(); c(at) = (c(at) ^ 0x41).toByte; c
    }
    val mixed = Seq(
      (0L, payloads(0L)),
      (1L, corrupt(payloads(1L), 150)),       // header checksum field flipped
      (2L, payloads(2L).dropRight(512)),      // terminator half gone
      (3L, corrupt(payloads(3L), 258))        // magic broken
    ).toDF("archive_id", "payload")
    val out = Tar.tarExtract(mixed).collect()
    assert(out.map(_.archive_id).distinct.toSeq == Seq(0L))
    assert(out.length == 10)
  }

  test("hostile payloads are dropped, not thrown") {
    val df = Seq(
      (1L, Array.emptyByteArray),
      (2L, new Array[Byte](512)),                       // one zero block, no second
      (3L, Array.fill[Byte](1024)('u'.toByte))          // garbage, non-block content
    ).toDF("archive_id", "payload")
    assert(Tar.tarExtract(df).collect().isEmpty)
    assert(Tar.tgzExtract(df).collect().isEmpty)
  }

  test("tar.xz: the xz layer composes under the same tar parse, damage drops whole") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"txz doc $i " + ("v" * (i % 30).toInt))).toDF("doc_id", "text")
    val plain = Tar.tarExtract(Tar.encodeTarArchives(docs, nArchives = 4)).collect()
      .map(e => (e.archive_id, e.rec_idx, e.rec_doc_id, e.n_bytes, e.checksum)).sorted.toSeq
    val archives = Tar.xzWrap(Tar.encodeTarArchives(docs, nArchives = 4))
    val viaXz = Tar.txzExtract(archives).collect()
      .map(e => (e.archive_id, e.rec_idx, e.rec_doc_id, e.n_bytes, e.checksum)).sorted.toSeq
    assert(viaXz == plain, "xz layer must be transparent to the tar parse")
    val damaged = archives.as[(Long, Array[Byte])].map { case (aid, p) =>
      if (aid == 2L) { val m = p.clone(); m(m.length / 2) = (m(m.length / 2) ^ 1).toByte; (aid, m) }
      else (aid, p)
    }.toDF("archive_id", "payload")
    val left = Tar.txzExtract(damaged).collect()
    assert(left.forall(_.archive_id != 2L) && left.nonEmpty)
  }
}
