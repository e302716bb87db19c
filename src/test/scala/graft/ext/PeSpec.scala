package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class PeSpec extends AnyFunSuite {

  test("round-trip: PE32 and PE32+ arms recover the closed forms") {
    var saw32 = false
    var saw64 = false
    for (id <- 0L until 96L) {
      val m = Pe.parsePe(id, Pe.renderPe(id))
      assert(m.pe_format == (if (Pe.is64Of(id)) "PE32+" else "PE32"), s"pe $id format")
      if (m.pe_format == "PE32") saw32 = true else saw64 = true
      assert(m.machine == Pe.machineOf(id), s"pe $id machine")
      assert(m.is_dll == Pe.isDllOf(id), s"pe $id dll bit")
      assert(m.subsystem == Pe.subsystemOf(id), s"pe $id subsystem")
      assert(m.entry_rva == Pe.entryRvaOf(id), s"pe $id entry")
      assert(m.n_sections == 3 && m.sections == ".text,.rdata,.data", s"pe $id sections")
      assert(m.n_imports == Pe.nImportsOf(id), s"pe $id import count")
      assert(m.imports ==
        (0 until Pe.nImportsOf(id)).map(Pe.importOf(id, _)).mkString(","), s"pe $id imports")
    }
    assert(saw32 && saw64, "both optional-header layouts occur")
  }

  test("RVA resolution goes through the section table, not offset guessing") {
    // move the import directory RVA to one no section maps -> quarantine
    val good = Pe.renderPe(0L)
    val pe = ((good(0x3c) & 0xff) | ((good(0x3d) & 0xff) << 8)).toInt
    val opt = pe + 24
    val ddOff = (if (Pe.is64Of(0L)) opt + 112 else opt + 96) + 8 // import entry
    val bad = good.clone()
    bad(ddOff + 2) = 0x70.toByte // RVA 0x70xxxx: unmapped
    assert(Pe.parsePeSafe(0L, bad).isEmpty, "unmapped import RVA quarantines")
  }

  test("damage ladder: MZ, e_lfanew bounds, PE signature, optional magic, truncation") {
    val id = 7L
    val good = Pe.renderPe(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Pe.parsePeSafe(id, mut(0, 'X'.toByte)).isEmpty, "MZ magic")
    assert(Pe.parsePeSafe(id, mut(0x3c, 0xff.toByte) match {
      case b => b(0x3d) = 0x7f.toByte; b
    }).isEmpty, "e_lfanew past the file")
    val pe = (good(0x3c) & 0xff) | ((good(0x3d) & 0xff) << 8)
    assert(Pe.parsePeSafe(id, mut(pe, 'Q'.toByte)).isEmpty, "PE signature")
    assert(Pe.parsePeSafe(id, mut(pe + 24, 0x0c.toByte)).isEmpty, "optional magic")
    assert(Pe.parsePeSafe(id, good.take(0x80)).isEmpty, "truncation")
    assert(Pe.parsePeSafe(id, Array.emptyByteArray).isEmpty)
  }

  test("operator: damaged binary quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Pe.encodePe(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(0x100)) else (id, b)
    }.toDF("doc_id", "pe")
    val got = Pe.peMeta(mixed).collect()
    assert(!got.exists(_.doc_id == 8L))
    assert(got.length == 23)
  }
}
