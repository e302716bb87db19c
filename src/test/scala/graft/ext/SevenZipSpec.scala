package graft.ext

import org.apache.commons.compress.archivers.sevenz.{SevenZArchiveEntry, SevenZFile, SevenZMethod, SevenZOutputFile}
import org.apache.commons.compress.utils.SeekableInMemoryByteChannel
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The from-scratch 7z stack, differentialed BOTH directions against
  * commons-compress (test-only, /opt/spark/jars): our archives open in
  * SevenZFile coder-by-coder, and SevenZOutputFile's LZMA2-coded
  * archives decode here through OUR LZMA2 decoder.
  */
class SevenZipSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def libRead(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val f = SevenZFile.builder().setSeekableByteChannel(new SeekableInMemoryByteChannel(bytes)).get()
    val out = Seq.newBuilder[(String, Array[Byte])]
    var e = f.getNextEntry
    while (e != null) {
      val buf = new Array[Byte](e.getSize.toInt)
      var off = 0
      while (off < buf.length) {
        val n = f.read(buf, off, buf.length - off)
        if (n < 0) throw new IllegalStateException("short read")
        off += n
      }
      out += ((e.getName, buf))
      e = f.getNextEntry
    }
    f.close()
    out.result()
  }

  private def libWrite(entries: Seq[(String, Array[Byte])], method: SevenZMethod): Array[Byte] = {
    val ch = new SeekableInMemoryByteChannel()
    val w = new SevenZOutputFile(ch)
    w.setContentCompression(method)
    entries.foreach { case (name, data) =>
      val e = new SevenZArchiveEntry()
      e.setName(name)
      e.setDirectory(false)
      w.putArchiveEntry(e)
      w.write(data)
      w.closeArchiveEntry()
    }
    w.finish()
    w.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }

  test("number coding: round-trips against the spec mask at the edges") {
    // write then re-read through demux's Reader via a tiny archive is
    // indirect; pin the encoder's byte shapes directly instead
    def enc(v: Long): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      SevenZip.writeNumber(o, v)
      o.toByteArray
    }
    assert(enc(0L).sameElements(Array[Byte](0)))
    assert(enc(0x7fL).sameElements(Array[Byte](0x7f)))
    assert(enc(0x80L).sameElements(Array[Byte](0x80.toByte, 0x80.toByte)))
    assert(enc(0x3fffL).sameElements(Array[Byte](0xbf.toByte, 0xff.toByte)))
    assert(enc(0x4000L).sameElements(Array[Byte](0xc0.toByte, 0x00, 0x40)))
    assert(enc(Long.MaxValue).length == 9)
  }

  test("differential: commons-compress opens our archives, both coders") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"seven zip document $i " * (1 + (i % 4).toInt))).toDF("doc_id", "text")
    val arch = SevenZip.encode7zArchives(docs, nArchives = 4).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    assert(arch.length == 4)
    arch.foreach { case (aid, payload) =>
      val got = libRead(payload)
      val wantIds = (0L until 40L).filter(_ % 4 == aid)
      assert(got.map(_._1) == wantIds.map(i => s"doc$i.txt"), s"archive $aid names")
      got.zip(wantIds).foreach { case ((_, data), i) =>
        val want = (i.toString + "\n" + s"seven zip document $i " * (1 + (i % 4).toInt)).getBytes("UTF-8")
        assert(data.sameElements(want), s"archive $aid entry $i (${if (aid % 2 == 1) "lzma2" else "copy"})")
      }
    }
  }

  test("differential: we decode commons-compress LZMA2 and COPY archives") {
    def body(i: Long): String = s"library written 7z body $i " * (1 + (i % 3).toInt)
    val entries = (0L until 12L).map(i => (s"doc$i.txt", (s"$i\n" + body(i)).getBytes("UTF-8")))
    for (method <- Seq(SevenZMethod.LZMA2, SevenZMethod.COPY)) {
      val bytes = libWrite(entries, method)
      val got = SevenZip.demux(3L, bytes, 1 << 26)
      assert(got.length == 12, s"$method")
      got.zipWithIndex.foreach { case (e, k) =>
        assert(e.rec_doc_id == k.toLong, s"$method id")
        val tb = body(k.toLong).getBytes("UTF-8")
        var c = 0L
        tb.foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
        assert(e.n_bytes == tb.length && e.checksum == c, s"$method rec $k")
      }
    }
  }

  test("kEncodedHeader: a header packed in an LZMA2 folder parses one level deep") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, s"encoded header doc $i")).toDF("doc_id", "text")
    val plain = SevenZip.encode7zArchives(docs, nArchives = 1).collect()
      .map(r => r.getAs[Array[Byte]]("payload")).head
    // split: [32-byte sig][pack streams][header]
    def u64(b: Array[Byte], p: Int): Long =
      (0 until 8).map(i => (b(p + i) & 0xffL) << (8 * i)).sum
    val hdrOff = 32 + u64(plain, 12).toInt
    val hdrLen = u64(plain, 20).toInt
    val header = java.util.Arrays.copyOfRange(plain, hdrOff, hdrOff + hdrLen)
    val packs = java.util.Arrays.copyOfRange(plain, 32, hdrOff)
    // compress the header into one LZMA2 folder appended after the packs
    val hz = new java.io.ByteArrayOutputStream()
    Xz.lzma2EncodeBody(header, 0, header.length, hz)
    val hzb = hz.toByteArray
    val enc = new java.io.ByteArrayOutputStream()
    enc.write(0x17) // kEncodedHeader
    enc.write(0x06); SevenZip.writeNumber(enc, packs.length.toLong) // packPos = after entry packs
    SevenZip.writeNumber(enc, 1L)
    enc.write(0x09); SevenZip.writeNumber(enc, hzb.length.toLong)
    enc.write(0x00)
    enc.write(0x07); enc.write(0x0b); SevenZip.writeNumber(enc, 1L); enc.write(0x00)
    SevenZip.writeNumber(enc, 1L) // one coder
    enc.write(0x21); enc.write(0x21); SevenZip.writeNumber(enc, 1L); enc.write(26)
    enc.write(0x0c); SevenZip.writeNumber(enc, header.length.toLong)
    enc.write(0x00) // kEnd UnpackInfo
    enc.write(0x00) // kEnd StreamsInfo
    val encHdr = enc.toByteArray
    // assemble the new archive
    val out = new java.io.ByteArrayOutputStream()
    out.write(plain, 0, 8) // magic + version
    val crcT = new java.util.zip.CRC32()
    val start = new java.io.ByteArrayOutputStream()
    def w64o(v: Long): Unit = (0 until 8).foreach(i => start.write(((v >>> (8 * i)) & 0xff).toInt))
    w64o((packs.length + hzb.length).toLong) // next header offset
    w64o(encHdr.length.toLong)
    crcT.update(encHdr)
    val hc = crcT.getValue.toInt
    start.write(hc & 0xff); start.write((hc >>> 8) & 0xff); start.write((hc >>> 16) & 0xff); start.write((hc >>> 24) & 0xff)
    val sb = start.toByteArray
    val crcS = new java.util.zip.CRC32()
    crcS.update(sb)
    val sc = crcS.getValue.toInt
    out.write(sc & 0xff); out.write((sc >>> 8) & 0xff); out.write((sc >>> 16) & 0xff); out.write((sc >>> 24) & 0xff)
    out.write(sb, 0, sb.length)
    out.write(packs, 0, packs.length)
    out.write(hzb, 0, hzb.length)
    out.write(encHdr, 0, encHdr.length)
    val reencoded = out.toByteArray
    val a = SevenZip.demux(0L, plain, 1 << 26)
    val b = SevenZip.demux(0L, reencoded, 1 << 26)
    assert(a == b, "encoded-header archive must demux identically")
    // and commons-compress agrees the re-framed archive is valid
    assert(libRead(reencoded).map(_._1) == (0L until 10L).map(i => s"doc$i.txt"))
  }

  test("damage quarantines: header crc, folder crc, pack bytes, truncation") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val rows = SevenZip.encode7zArchives(docs, nArchives = 4).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    def withMut(aid: Long)(mut: Array[Byte] => Array[Byte]) =
      rows.map { case (a, p) => if (a == aid) (a, mut(p)) else (a, p) }.toSeq.toDF("archive_id", "payload")
    // flip a pack-region byte (content): folder CRC catches it
    val pack = SevenZip.sevenZExtract(withMut(0L) { p =>
      val q = p.clone(); q(40) = (q(40) ^ 1).toByte; q
    }).collect()
    assert(!pack.exists(_.archive_id == 0L) && pack.length == 30)
    // flip a header byte: next-header CRC catches it
    val hdr = SevenZip.sevenZExtract(withMut(1L) { p =>
      val q = p.clone(); q(q.length - 3) = (q(q.length - 3) ^ 1).toByte; q
    }).collect()
    assert(!hdr.exists(_.archive_id == 1L))
    // truncate
    val tr = SevenZip.sevenZExtract(withMut(2L)(p => p.take(p.length - 9))).collect()
    assert(!tr.exists(_.archive_id == 2L))
    assert(SevenZip.sevenZExtract(rows.toSeq.toDF("archive_id", "payload")).collect().length == 40)
  }

  test("end-to-end + partition stability") {
    import spark.implicits._
    val docs = (0L until 64L).map(i => (i, s"stable 7z doc $i")).toDF("doc_id", "text")
    val a = SevenZip.sevenZExtract(SevenZip.encode7zArchives(docs, nArchives = 4)).collect()
    val b = SevenZip.sevenZExtract(SevenZip.encode7zArchives(docs.repartition(9), nArchives = 4)).collect()
    assert(a.length == 64)
    assert(a.map(e => (e.rec_doc_id, e.checksum)).sorted.toSeq ==
      b.map(e => (e.rec_doc_id, e.checksum)).sorted.toSeq)
  }
}
