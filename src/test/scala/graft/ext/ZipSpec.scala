package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ZipSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"document $i body " + ("lorem ipsum " * (i % 7)) + s"tail$i"))
      .toDF("doc_id", "text")

  private def checksum(s: String): Long = {
    var c = 0L
    s.getBytes(UTF_8).foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
    c
  }

  test("round trip: every doc comes back with exact bytes across all method/flag profiles") {
    val d = docs(60) // covers id%3 methods, id%5 descriptors, id%10 both spellings, id%4 extras
    val out = Zip.zipExtract(Zip.encodeZipArchives(d, nArchives = 4)).collect()
    assert(out.length == 60)
    val expected = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { e =>
      val text = expected(e.rec_doc_id)
      assert(e.n_bytes == text.getBytes(UTF_8).length.toLong, s"doc ${e.rec_doc_id} size")
      assert(e.checksum == checksum(text), s"doc ${e.rec_doc_id} content")
      assert(e.archive_id == e.rec_doc_id % 4)
    }
    // rec_idx is doc order within the archive
    out.groupBy(_.archive_id).foreach { case (_, es) =>
      assert(es.sortBy(_.rec_idx).map(_.rec_doc_id).toSeq == es.map(_.rec_doc_id).sorted.toSeq)
    }
  }

  test("our archives are valid per java.util.zip.ZipFile (writer differential)") {
    val payloads = Zip.encodeZipArchives(docs(40), nArchives = 4)
      .select("archive_id", "payload").as[(Long, Array[Byte])].collect()
    payloads.foreach { case (aid, bytes) =>
      val f = java.io.File.createTempFile(s"graftzip$aid", ".zip")
      try {
        java.nio.file.Files.write(f.toPath, bytes)
        val zf = new java.util.zip.ZipFile(f)
        try {
          val entries = zf.entries()
          var n = 0
          while (entries.hasMoreElements) {
            val e = entries.nextElement()
            val id = e.getName.stripPrefix("d").stripSuffix(".txt").toLong
            assert(id % 4 == aid)
            val body = new String(zf.getInputStream(e).readAllBytes(), UTF_8)
            assert(body.startsWith(s"document $id body "), s"entry $id body")
            n += 1
          }
          assert(n == 10)
          assert(zf.getComment == s"graft archive $aid")
        } finally zf.close()
      } finally f.delete()
    }
  }

  test("foreign archives from java.util.zip.ZipOutputStream parse (reader differential)") {
    val texts = (0 until 12).map(i => i.toLong -> (s"foreign doc $i " + ("abc " * i))).toMap
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    texts.toSeq.sortBy(_._1).foreach { case (id, t) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(s"d$id.txt"))
      zos.write(t.getBytes(UTF_8))
      zos.closeEntry()
    }
    zos.close()
    val df = Seq((7L, bos.toByteArray)).toDF("archive_id", "payload")
    val out = Zip.zipExtract(df).collect().sortBy(_.rec_idx)
    assert(out.length == 12)
    out.foreach { e =>
      assert(e.archive_id == 7L)
      assert(e.checksum == checksum(texts(e.rec_doc_id)))
    }
  }

  test("damage drops the whole archive; clean archives in the same batch survive") {
    val payloads = Zip.encodeZipArchives(docs(40), nArchives = 4)
      .select("archive_id", "payload").as[(Long, Array[Byte])].collect().toMap
    def corrupt(b: Array[Byte], at: Int): Array[Byte] = {
      val c = b.clone(); c(at) = (c(at) ^ 0x41).toByte; c
    }
    val mixed = Seq(
      (0L, payloads(0L)),
      (1L, corrupt(payloads(1L), payloads(1L).length / 2)), // mid-data flip -> CRC fails
      (2L, payloads(2L).dropRight(3)),                      // truncated EOCD
      (3L, corrupt(payloads(3L), 0))                        // LFH signature gone
    ).toDF("archive_id", "payload")
    val out = Zip.zipExtract(mixed).collect()
    assert(out.map(_.archive_id).distinct.sorted.toSeq == Seq(0L))
    assert(out.length == 10)
  }

  test("empty and hostile payloads are dropped, not thrown") {
    val df = Seq(
      (1L, Array.emptyByteArray),
      (2L, Array.fill[Byte](100)(0x50)),
      (3L, "PK".getBytes(UTF_8) ++ Array.fill[Byte](18)(0))
    ).toDF("archive_id", "payload")
    assert(Zip.zipExtract(df).collect().isEmpty)
  }
}
