package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class MachoSpec extends AnyFunSuite {

  test("round-trip: thin and fat arms recover the closed forms") {
    var sawFat = false
    var sawThin = false
    for (id <- 0L until 96L) {
      val rows = Macho.parseMacho(id, Macho.renderMacho(id))
      val nSlices = if (Macho.isFat(id)) 2 else 1
      if (Macho.isFat(id)) sawFat = true else sawThin = true
      assert(rows.length == nSlices, s"macho $id slice count")
      rows.zipWithIndex.foreach { case (m, s) =>
        assert(m.slice_idx == s && m.fat == Macho.isFat(id), s"macho $id s$s wrap")
        assert(m.cputype == Macho.cpuOf(id, s), s"macho $id s$s cpu")
        assert(m.filetype == Macho.filetypeOf(id), s"macho $id s$s filetype")
        val nd = Macho.nDylibsOf(id)
        val isExe = Macho.filetypeOf(id) == "EXECUTE"
        assert(m.ncmds == 2 + nd + 1 + (if (isExe) 1 else 0), s"macho $id s$s ncmds")
        assert(m.n_segs == 2 && m.segs == "__TEXT,__LINKEDIT", s"macho $id s$s segs")
        assert(m.n_dylibs == nd &&
          m.dylibs == (0 until nd).map(Macho.dylibOf(id, _)).mkString(","), s"macho $id s$s dylibs")
        assert(m.has_uuid, s"macho $id s$s uuid")
        assert(m.entry_off == (if (isExe) Macho.entryOffOf(id) else -1L), s"macho $id s$s entry")
      }
    }
    assert(sawFat && sawThin, "both container arms occur")
    // the weak-dylib arm (LC_REQ_DYLD high bit) must occur and be parsed
    assert((0L until 96L).exists(i => i % 5 == 1 && Macho.nDylibsOf(i) == 2),
      "LC_LOAD_WEAK_DYLIB arm occurs in the corpus")
  }

  test("fat slice cputype must match the thin header inside it") {
    val id = 2L
    assert(Macho.isFat(id))
    val good = Macho.renderMacho(id)
    assert(Macho.parseMacho(id, good).nonEmpty)
    // swap the first fat entry's declared cputype (BE at offset 8)
    val bad = good.clone()
    bad(11) = 0x07.toByte // arm64 (0x0100000c) -> x86_64 (0x01000007)
    assert(Macho.parseMachoSafe(id, bad).isEmpty, "declared/actual cputype mismatch")
  }

  test("damage ladder: magic, cmdsize rules, dylib name offset, truncation") {
    val id = 0L
    assert(!Macho.isFat(id))
    val good = Macho.renderMacho(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Macho.parseMachoSafe(id, mut(0, 0.toByte)).isEmpty, "magic")
    assert(Macho.parseMachoSafe(id, good.take(40)).isEmpty, "truncation")
    assert(Macho.parseMachoSafe(id, Array.emptyByteArray).isEmpty)
    // corrupt the first load command's cmdsize to a misaligned value
    assert(Macho.parseMachoSafe(id, mut(36, 0x45.toByte)).isEmpty, "misaligned cmdsize")
    // shrink sizeofcmds: the walk no longer lands exactly
    assert(Macho.parseMachoSafe(id, mut(20, ((good(20) & 0xff) - 8).toByte)).isEmpty,
      "sizeofcmds mismatch")
  }

  test("operator: damaged binary quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Macho.encodeMacho(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 9)) else (id, b)
    }.toDF("doc_id", "macho")
    val got = Macho.machoMeta(mixed).collect()
    assert(!got.exists(_.doc_id == 8L))
    val expected = (0L until 24L).filter(_ != 8L).map(i => if (Macho.isFat(i)) 2 else 1).sum
    assert(got.length == expected)
  }
}
