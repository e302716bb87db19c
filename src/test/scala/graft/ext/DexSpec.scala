package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class DexSpec extends AnyFunSuite {

  test("round-trip: verified integrity + double indirection recover the closed forms") {
    for (id <- 0L until 96L) {
      val rows = Dex.parseDex(id, Dex.renderDex(id))
      val nc = Dex.nClassesOf(id)
      assert(rows.length == nc, s"dex $id class count")
      assert(rows.forall(_.dex_version == Dex.versionOf(id)), s"dex $id version")
      for (c <- 0 until nc) {
        val r = rows(c)
        assert(r.class_idx == c, s"dex $id c$c idx")
        assert(r.class_name == Dex.classNameOf(id, c), s"dex $id c$c name")
        assert(r.superclass == "Ljava/lang/Object;", s"dex $id c$c super")
        assert(r.source_file == Dex.sourceOf(id, c), s"dex $id c$c source")
        assert(r.access_flags == Dex.flagsOf(id, c), s"dex $id c$c flags")
      }
    }
  }

  test("the checksum and signature are VERIFIED: flip one payload byte, both die") {
    val good = Dex.renderDex(3L)
    assert(Dex.parseDex(3L, good).nonEmpty)
    // flip a byte deep in the data section: adler catches it
    val bad = good.clone()
    bad(good.length - 3) = (bad(good.length - 3) ^ 0x40).toByte
    assert(Dex.parseDexSafe(3L, bad).isEmpty, "payload flip fails the checksum")
    // fix up the adler to match, leaving the SHA-1 wrong: signature catches it
    val fixed = bad.clone()
    val a = Multimodal.adler32(fixed, 12, fixed.length).toLong & 0xffffffffL
    var i = 0
    while (i < 4) { fixed(8 + i) = ((a >>> (8 * i)) & 0xff).toByte; i += 1 }
    assert(Dex.parseDexSafe(3L, fixed).isEmpty, "a recomputed checksum still fails the SHA-1")
  }

  test("damage ladder: magic, version, endian tag, header size, counts") {
    val id = 7L
    val good = Dex.renderDex(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Dex.parseDexSafe(id, mut(0, 'x'.toByte)).isEmpty, "magic")
    assert(Dex.parseDexSafe(id, mut(4, '9'.toByte)).isEmpty, "version out of range")
    assert(Dex.parseDexSafe(id, good.take(good.length - 1)).isEmpty, "file_size rule")
    assert(Dex.parseDexSafe(id, good.take(40)).isEmpty, "truncation")
    assert(Dex.parseDexSafe(id, Array.emptyByteArray).isEmpty)
  }

  test("operator: damaged dex quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Dex.encodeDex(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 4)) else (id, b)
    }.toDF("doc_id", "dex")
    val got = Dex.dexClasses(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    for (id <- (0L until 24L) if id != 8L)
      assert(byDoc(id).length == Dex.nClassesOf(id), s"dex $id")
  }
}
