package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class CpioSpec extends AnyFunSuite {

  test("round-trip: newc and crc archives recover the closed forms") {
    for (id <- 0L until 96L) {
      val es = Cpio.parseCpio(id, Cpio.renderCpio(id))
      val nf = Cpio.nFiles(id)
      assert(es.length == 1 + nf, s"cpio $id entry count")
      val dir = es.head
      assert(dir.name == s"payload$id" && dir.ftype == "d" && dir.n_bytes == 0)
      for (j <- 0 until nf) {
        val e = es(1 + j)
        assert(e.name == s"payload$id/f$j.dat" && e.ftype == "f", s"cpio $id f$j")
        assert(e.mtime == Cpio.mtimeOf(id, j), s"cpio $id f$j mtime")
        val body = Cpio.fileBody(id, j).getBytes("UTF-8")
        assert(e.n_bytes == body.length.toLong, s"cpio $id f$j bytes")
        var ck = 0L
        body.foreach(x => ck = (ck * 31 + (x & 0xff)) % 1000000007L)
        assert(e.checksum == ck, s"cpio $id f$j checksum")
      }
    }
  }

  test("foreign differential: commons-compress reads our archives entry-for-entry") {
    for (id <- Seq(0L, 1L)) { // both magics: 070701 and 070702
      val bytes = Cpio.renderCpio(id)
      val ours = Cpio.parseCpio(id, bytes)
      val in = new org.apache.commons.compress.archivers.cpio.CpioArchiveInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val theirs = Iterator.continually(in.getNextEntry).takeWhile(_ != null).map { e =>
        val data = new Array[Byte](e.getSize.toInt)
        var off = 0
        while (off < data.length) {
          val n = in.read(data, off, data.length - off)
          assert(n > 0)
          off += n
        }
        (e.getName, e.getSize, e.getTime, e.isDirectory)
      }.toSeq
      in.close()
      assert(ours.map(o => (o.name, o.n_bytes, o.mtime, o.ftype == "d")) == theirs,
        s"cpio $id entries")
    }
  }

  test("foreign differential: our reader consumes commons-compress output (both formats)") {
    import org.apache.commons.compress.archivers.cpio._
    for (fmt <- Seq(CpioConstants.FORMAT_NEW, CpioConstants.FORMAT_NEW_CRC)) {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new CpioArchiveOutputStream(bos, fmt)
      for ((name, body) <- Seq(("one.txt", "payload one"), ("dir/two.txt", "the second"))) {
        val data = body.getBytes("UTF-8")
        val e = new CpioArchiveEntry(fmt, name, data.length.toLong)
        e.setTime(1700000123L)
        if (fmt == CpioConstants.FORMAT_NEW_CRC) {
          var s = 0L
          data.foreach(x => s = (s + (x & 0xff)) & 0xffffffffL)
          e.setChksum(s)
        }
        out.putArchiveEntry(e)
        out.write(data)
        out.closeArchiveEntry()
      }
      out.close()
      val ours = Cpio.parseCpio(99L, bos.toByteArray)
      assert(ours.map(_.name) == Seq("one.txt", "dir/two.txt"), s"fmt $fmt names")
      assert(ours.forall(_.ftype == "f") && ours.forall(_.mtime == 1700000123L), s"fmt $fmt meta")
      assert(ours.map(_.n_bytes) == Seq(11L, 10L), s"fmt $fmt sizes")
    }
  }

  test("the 070702 check field is verified, not echoed") {
    // id 1 renders with the crc magic; flip a payload byte only — the
    // header still parses, the data sum no longer matches
    val good = Cpio.renderCpio(1L)
    assert(Cpio.parseCpio(1L, good).nonEmpty)
    // find the first payload file's data (after dir entry + file header)
    val marker = "cpio member 0 of 1:".getBytes("UTF-8")
    val at = good.indexOfSlice(marker)
    assert(at > 0)
    val bad = good.clone()
    bad(at) = 'X'.toByte
    assert(Cpio.parseCpioSafe(1L, bad).isEmpty, "check mismatch must quarantine")
    // the SAME flip on a 070701 archive is invisible to the format
    // (no checksum) — the archive still parses, with a different rolling
    // checksum in our inventory
    val good0 = Cpio.renderCpio(0L)
    val marker0 = "cpio member 0 of 0:".getBytes("UTF-8")
    val at0 = good0.indexOfSlice(marker0)
    val bad0 = good0.clone()
    bad0(at0) = 'X'.toByte
    assert(Cpio.parseCpioSafe(0L, bad0).nonEmpty, "newc has no check to fail")
  }

  test("damage ladder: magic, hex, namesize, missing trailer, truncation quarantine") {
    val id = 2L
    val good = Cpio.renderCpio(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Cpio.parseCpioSafe(id, mut(0, 'X'.toByte)).isEmpty, "magic")
    assert(Cpio.parseCpioSafe(id, mut(14, 'G'.toByte)).isEmpty, "non-hex mode")
    assert(Cpio.parseCpioSafe(id, good.take(good.length - 20)).isEmpty, "missing trailer")
    assert(Cpio.parseCpioSafe(id, good.take(60)).isEmpty, "truncation")
    assert(Cpio.parseCpioSafe(id, Array.emptyByteArray).isEmpty)
    // namesize 0
    assert(Cpio.parseCpioSafe(id, mut(94, '0'.toByte) match {
      case b => (95 until 102).foreach(i => b(i) = '0'.toByte); b
    }).isEmpty, "zero namesize")
  }

  test("exact consumption: bytes after the trailer must be NUL padding only") {
    val id = 2L
    val good = Cpio.renderCpio(id)
    assert(Cpio.parseCpioSafe(id, good).nonEmpty)
    // writers block-pad with NULs (commons-compress pads to 512) — accepted
    assert(Cpio.parseCpioSafe(id, good ++ new Array[Byte](512 - good.length % 512)).nonEmpty,
      "NUL block padding")
    // arbitrary trailing garbage is damage, not silently ignored
    assert(Cpio.parseCpioSafe(id, good ++ "garbage".getBytes("UTF-8")).isEmpty,
      "trailing garbage")
    assert(Cpio.parseCpioSafe(id, good ++ new Array[Byte](8) ++ Array('x'.toByte)).isEmpty,
      "garbage after padding")
  }

  test("operator: damaged archive quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Cpio.encodeCpio(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 5)) else (id, b)
    }.toDF("doc_id", "cpio")
    val got = Cpio.cpioEntries(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    for (id <- (0L until 24L) if id != 8L)
      assert(byDoc(id).length == 1 + Cpio.nFiles(id), s"cpio $id")
  }
}
