package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class DebSpec extends AnyFunSuite {

  test("round-trip: ar + gzip + tar + control recover the closed forms") {
    var sawDepends = false
    var sawNoDepends = false
    for (id <- 0L until 96L) {
      val m = Deb.parseDeb(id, Deb.renderDeb(id))
      assert(m.package_name == Deb.pkgName(id), s"deb $id package")
      assert(m.version == Deb.version(id), s"deb $id version")
      assert(m.arch == Deb.arch(id), s"deb $id arch")
      assert(m.installed_size == Deb.installedSize(id), s"deb $id size")
      assert(m.depends == Deb.depends(id), s"deb $id depends")
      if (m.depends.isDefined) sawDepends = true else sawNoDepends = true
      assert(m.n_files == Deb.nFiles(id).toLong, s"deb $id files")
      val bodies = (0 until Deb.nFiles(id)).map(Deb.fileBody(id, _)).mkString("")
      assert(m.data_bytes == bodies.getBytes("UTF-8").length.toLong, s"deb $id bytes")
      var ck = 0L
      bodies.getBytes("UTF-8").foreach(x => ck = (ck * 31 + (x & 0xff)) % 1000000007L)
      assert(m.data_checksum == ck, s"deb $id checksum")
    }
    assert(sawDepends && sawNoDepends, "both Depends arms occur")
  }

  test("foreign differential: commons-compress reads our ar layout member-for-member") {
    // both ar name styles occur: id 0 space-padded, id 1 GNU trailing-slash
    for (id <- Seq(0L, 1L)) {
      val bytes = Deb.renderDeb(id)
      val ours = Deb.parseAr(bytes)
      val in = new org.apache.commons.compress.archivers.ar.ArArchiveInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val theirs = Iterator.continually(in.getNextEntry).takeWhile(_ != null).map { e =>
        val data = new Array[Byte](e.getSize.toInt)
        var off = 0
        while (off < data.length) {
          val n = in.read(data, off, data.length - off)
          assert(n > 0)
          off += n
        }
        (e.getName, data.toSeq)
      }.toSeq
      in.close()
      assert(ours.map(m => (m._1, m._2.toSeq)) == theirs, s"deb $id ar members")
    }
  }

  test("foreign differential: our ar reader consumes commons-compress output") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.apache.commons.compress.archivers.ar.ArArchiveOutputStream(bos)
    for ((name, body) <- Seq(("alpha.txt", "first member"), ("b.bin", "odd-length!"))) {
      val data = body.getBytes("UTF-8")
      out.putArchiveEntry(new org.apache.commons.compress.archivers.ar.ArArchiveEntry(
        name, data.length.toLong))
      out.write(data)
      out.closeArchiveEntry()
    }
    out.close()
    val ours = Deb.parseAr(bos.toByteArray)
    assert(ours.map(_._1) == Seq("alpha.txt", "b.bin"))
    assert(new String(ours(1)._2, "UTF-8") == "odd-length!")
  }

  test("control folding: continuation lines join, duplicates are damage") {
    val f = Deb.parseControl("A: one\nB: two\n more\n and more\nC:three\n")
    assert(f("A") == "one")
    assert(f("B") == "two\nmore\nand more")
    assert(f("C") == "three")
    intercept[RuntimeException](Deb.parseControl("A: x\nA: y\n"))
    intercept[RuntimeException](Deb.parseControl(" leading continuation\n"))
    intercept[RuntimeException](Deb.parseControl("no-colon-line\n"))
  }

  test("damage ladder: ar magic, member magic, version, gzip, tar, control quarantine") {
    val id = 7L
    val good = Deb.renderDeb(id)
    assert(Deb.parseDebSafe(id, good).isDefined)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Deb.parseDebSafe(id, mut(0, 'X'.toByte)).isEmpty, "ar magic")
    assert(Deb.parseDebSafe(id, mut(8 + 58, 0.toByte)).isEmpty, "member end magic")
    assert(Deb.parseDebSafe(id, mut(8 + 60, '3'.toByte)).isEmpty, "debian-binary version")
    assert(Deb.parseDebSafe(id, good.take(100)).isEmpty, "truncation")
    assert(Deb.parseDebSafe(id, Array.emptyByteArray).isEmpty)
    // flip one byte mid control.tar.gz: the gzip CRC must catch it
    assert(Deb.parseDebSafe(id, mut(8 + 60 + 4 + 60 + 40, 0x55.toByte)).isEmpty, "gzip damage")
  }

  test("operator: damaged package quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Deb.encodeDeb(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 9)) else (id, b)
    }.toDF("doc_id", "deb")
    val got = Deb.debExtract(mixed).collect()
    assert(!got.exists(_.doc_id == 8L))
    assert(got.length == 23)
  }
}
