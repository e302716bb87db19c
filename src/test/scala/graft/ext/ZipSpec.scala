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

  test("ZIP64: forced structures parse identically; java.util.zip reads our writer") {
    val entries = Seq(
      ("a/first.txt", ("alpha " * 40).getBytes(UTF_8), 0),
      ("second.bin", (0 until 5000).map(i => ((i * 37 + 11) % 251).toByte).toArray, 8),
      ("third.txt", "tiny".getBytes(UTF_8), 0))
    val plain = Zip.parseArchiveFilesWithOffsets(Zip.buildZip(entries), 1 << 26)
    val z64bytes = Zip.buildZip64(entries)
    val z64 = Zip.parseArchiveFilesWithOffsets(z64bytes, 1 << 26)
    assert(z64.map(e => (e._1, e._2.toSeq, e._3)) == plain.map(e => (e._1, e._2.toSeq, e._3)))
    // foreign differential: the JDK's CD-driven reader accepts the layout
    val tmp = java.io.File.createTempFile("graft-z64", ".zip")
    try {
      java.nio.file.Files.write(tmp.toPath, z64bytes)
      val zf = new java.util.zip.ZipFile(tmp)
      try {
        import scala.jdk.CollectionConverters._
        val got = zf.entries().asScala.map { e =>
          val in = zf.getInputStream(e)
          val bytes = in.readAllBytes(); in.close()
          (e.getName, bytes.toSeq)
        }.toMap
        assert(got == entries.map(e => e._1 -> e._2.toSeq).toMap)
      } finally zf.close()
    } finally tmp.delete()
    // damage ladder: each ZIP64 structure violation quarantines
    def parse(b: Array[Byte]) =
      try { Zip.parseArchiveFiles(b, 1 << 26); true }
      catch { case scala.util.control.NonFatal(_) => false }
    assert(parse(z64bytes))
    val noLocator = z64bytes.clone()
    noLocator(z64bytes.length - 42) = 'X' // locator signature (20 + 22 from EOF)
    assert(!parse(noLocator))
    val badE64 = z64bytes.clone()
    // the locator's eocd64-offset field (8 bytes into the locator)
    badE64(z64bytes.length - 42 + 8) = (badE64(z64bytes.length - 42 + 8) ^ 0x7f).toByte
    assert(!parse(badE64))
    // a hostile eocd64 offset near Long.MaxValue must hit the guard, not
    // wrap past it (review-pass regression: e64 + 56 overflowed)
    val hostile = z64bytes.clone()
    val locAt = z64bytes.length - 42
    val hugeOff = 0x7fffffffffffffc8L
    (0 until 8).foreach(k => hostile(locAt + 8 + k) = ((hugeOff >> (8 * k)) & 0xff).toByte)
    assert(!parse(hostile))
    // a saturated CD field whose 0x0001 extra block is renamed away
    val noExtra = z64bytes.clone()
    var i = 0
    var patched = 0
    while (i + 4 <= noExtra.length) {
      if ((noExtra(i) & 0xff) == 0x01 && noExtra(i + 1) == 0 &&
        (noExtra(i + 2) & 0xff) == 24 && noExtra(i + 3) == 0) {
        noExtra(i) = 0x7a; patched += 1
      }
      i += 1
    }
    assert(patched == entries.length && !parse(noExtra))
  }
}
