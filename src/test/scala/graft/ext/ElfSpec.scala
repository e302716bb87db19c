package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class ElfSpec extends AnyFunSuite {

  test("round-trip: both 32- and 64-bit arms recover the closed forms") {
    var saw32 = false
    var saw64 = false
    for (id <- 0L until 96L) {
      val m = Elf.parseElf(id, Elf.renderElf(id))
      assert(m.bits == Elf.bitsOf(id), s"elf $id class")
      if (m.bits == 32) saw32 = true else saw64 = true
      assert(m.etype == Elf.etypeOf(id), s"elf $id type")
      assert(m.machine == Elf.machineOf(id), s"elf $id machine")
      assert(m.n_phdrs == 3 && m.n_shdrs == 6, s"elf $id geometry")
      assert(m.interp == Elf.interpOf(id), s"elf $id interp")
      assert(m.text_size == Elf.textSizeOf(id), s"elf $id text")
      assert(m.n_needed == Elf.nNeededOf(id), s"elf $id needed count")
      assert(m.needed ==
        (0 until Elf.nNeededOf(id)).map(Elf.neededOf(id, _)).mkString(","), s"elf $id needed")
    }
    assert(saw32 && saw64, "both ELF classes occur")
  }

  test("real-world conformance: the running JVM's own java launcher parses") {
    val launcher = new java.io.File(System.getProperty("java.home"), "bin/java")
    assert(launcher.isFile, "the launcher must exist in java.home")
    val bytes = java.nio.file.Files.readAllBytes(launcher.toPath)
    val m = Elf.parseElf(0L, bytes)
    assert(m.bits == 64, "the JVM launcher is a 64-bit ELF")
    assert(m.etype == "DYN" || m.etype == "EXEC", s"launcher type ${m.etype}")
    assert(m.n_shdrs > 0 && m.n_phdrs > 0)
    assert(m.interp.nonEmpty && m.interp.contains("ld-"), s"interp ${m.interp}")
    assert(m.n_needed > 0 && m.needed.split(",").forall(_.contains(".so")),
      s"needed ${m.needed}")
    assert(m.needed.contains("libjli"), "every java launcher links the JLI library")
    assert(m.text_size > 0, "a real launcher has .text")
  }

  test("damage ladder: magic, class, endian, geometry, string bounds quarantine") {
    val id = 7L
    val good = Elf.renderElf(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Elf.parseElfSafe(id, mut(0, 0.toByte)).isEmpty, "magic")
    assert(Elf.parseElfSafe(id, mut(4, 3.toByte)).isEmpty, "undefined class")
    assert(Elf.parseElfSafe(id, mut(5, 2.toByte)).isEmpty, "big-endian quarantines")
    assert(Elf.parseElfSafe(id, good.take(40)).isEmpty, "truncation")
    assert(Elf.parseElfSafe(id, good.take(good.length - 30)).isEmpty, "lost section headers")
    assert(Elf.parseElfSafe(id, Array.emptyByteArray).isEmpty)
  }

  test("operator: damaged binary quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Elf.encodeElf(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 13)) else (id, b)
    }.toDF("doc_id", "elf")
    val got = Elf.elfMeta(mixed).collect()
    assert(!got.exists(_.doc_id == 8L))
    assert(got.length == 23)
  }
}
