package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class RpmSpec extends AnyFunSuite {

  test("round-trip: lead + both headers + gzip cpio payload recover the closed forms") {
    for (id <- 0L until 96L) {
      val m = Rpm.parseRpm(id, Rpm.renderRpm(id))
      assert(m.name == Rpm.nameOf(id), s"rpm $id name")
      assert(m.version == Rpm.versionOf(id), s"rpm $id version")
      assert(m.release == Rpm.releaseOf(id), s"rpm $id release")
      assert(m.arch == Rpm.archOf(id), s"rpm $id arch")
      assert(m.license == Rpm.licenseOf(id), s"rpm $id license")
      val bodies = (0 until Rpm.nFiles(id)).map(Rpm.fileBody(id, _))
      assert(m.size == bodies.map(_.getBytes("UTF-8").length.toLong).sum, s"rpm $id size")
      assert(m.n_payload_files == Rpm.nFiles(id).toLong, s"rpm $id files")
      assert(m.payload_bytes == m.size, s"rpm $id bytes")
      var ck = 0L
      bodies.foreach { body =>
        var f = 0L
        body.getBytes("UTF-8").foreach(x => f = (f * 31 + (x & 0xff)) % 1000000007L)
        ck = (ck * 131 + f) % 1000000007L
      }
      assert(m.payload_checksum == ck, s"rpm $id checksum")
    }
  }

  test("payload compressor/format tags are enforced, not echoed") {
    // corrupt the 'gzip' string in the main header store to 'gzi\0'
    val good = Rpm.renderRpm(3L)
    val at = good.indexOfSlice("gzip".getBytes("UTF-8") :+ 0.toByte)
    assert(at > 0)
    val bad = good.clone()
    bad(at + 3) = 0.toByte
    assert(Rpm.parseRpmSafe(3L, bad).isEmpty, "a non-gzip compressor must quarantine")
  }

  test("the SIZE tag is cross-checked against the decoded payload inventory") {
    val good = Rpm.renderRpm(4L)
    // find the int32 SIZE value in the store by searching for the tag entry
    // and flipping the stored value's low byte via the header walk: easier —
    // flip a payload BODY byte inside the gzip stream instead, which the
    // gzip CRC catches; so patch SIZE itself through the known store offset:
    // locate the main header (96 + sig + pad), entry with tag 1009
    def u32(b: Array[Byte], p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) | ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    val sigN = u32(good, 96 + 8).toInt
    val sigH = u32(good, 96 + 12).toInt
    val sigLen = 16 + 16 * sigN + sigH
    val mainStart = 96 + sigLen + ((8 - sigLen % 8) % 8)
    val n = u32(good, mainStart + 8).toInt
    val storeStart = mainStart + 16 + 16 * n
    val off = (0 until n).collectFirst {
      case i if u32(good, mainStart + 16 + 16 * i) == 1009L =>
        u32(good, mainStart + 16 + 16 * i + 8).toInt
    }.get
    val bad = good.clone()
    bad(storeStart + off + 3) = ((bad(storeStart + off + 3) ^ 1) & 0xff).toByte
    assert(Rpm.parseRpmSafe(4L, bad).isEmpty, "SIZE mismatch must quarantine")
  }

  test("trailing garbage after the gzip payload quarantines") {
    val good = Rpm.renderRpm(5L)
    assert(Rpm.parseRpmSafe(5L, good).isDefined)
    assert(Rpm.parseRpmSafe(5L, good ++ "junk".getBytes("UTF-8")).isEmpty,
      "concatenated junk must not parse")
  }

  test("damage ladder: lead magic, header magic, store bounds, gzip, truncation") {
    val id = 7L
    val good = Rpm.renderRpm(id)
    assert(Rpm.parseRpmSafe(id, good).isDefined)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Rpm.parseRpmSafe(id, mut(0, 0.toByte)).isEmpty, "lead magic")
    assert(Rpm.parseRpmSafe(id, mut(4, 9.toByte)).isEmpty, "lead version")
    assert(Rpm.parseRpmSafe(id, mut(96, 0.toByte)).isEmpty, "signature header magic")
    assert(Rpm.parseRpmSafe(id, good.take(100)).isEmpty, "truncation")
    assert(Rpm.parseRpmSafe(id, good.take(good.length - 6)).isEmpty, "payload truncation")
    assert(Rpm.parseRpmSafe(id, Array.emptyByteArray).isEmpty)
  }

  test("operator: damaged package quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Rpm.encodeRpm(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 11)) else (id, b)
    }.toDF("doc_id", "rpm")
    val got = Rpm.rpmMeta(mixed).collect()
    assert(!got.exists(_.doc_id == 8L))
    assert(got.length == 23)
  }
}
