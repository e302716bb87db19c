package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class NpySpec extends AnyFunSuite {

  test("round-trip: v1/v2 headers, all dtype arms, npy and npz recover the closed forms") {
    var sawV2 = false
    var sawNpz = false
    var sawFortran = false
    for (id <- 0L until 96L) {
      val rows = Npy.parseFileSafe(id, Npy.renderFile(id))
      assert(rows.length == Npy.nArrays(id), s"npy $id array count")
      if (Npy.isNpz(id)) sawNpz = true
      for (j <- 0 until Npy.nArrays(id)) {
        val member = if (Npy.isNpz(id)) s"arr_$j.npy" else ""
        val a = rows.find(_.member == member).getOrElse(fail(s"npy $id member $j"))
        if (a.version == 2) sawV2 = true
        if (a.fortran) sawFortran = true
        assert(a.descr == Npy.descrOf(id, j), s"npy $id a$j descr")
        assert(a.fortran == Npy.fortranOf(id, j), s"npy $id a$j order")
        val shape = Npy.shapeOf(id, j)
        assert(a.n_dims == shape.length && a.n_elems == shape.product, s"npy $id a$j shape")
        val expected = (0 until shape.product).map(Npy.elemValue(id, j, _)).sum
        assert(a.val_sum == expected, s"npy $id a$j sum")
      }
    }
    assert(sawV2 && sawNpz && sawFortran, "v2, npz, and fortran arms all occur")
  }

  test("header grammar: the documented dict shapes parse; near-misses quarantine") {
    assert(Npy.parseHeaderDict(
      "{'descr': '<f8', 'fortran_order': False, 'shape': (3, 4), }") ==
      (("<f8", false, Seq(3L, 4L))))
    assert(Npy.parseHeaderDict(
      "{'descr': '<i4', 'fortran_order': True, 'shape': (5,), }") ==
      (("<i4", true, Seq(5L))))
    assert(Npy.parseHeaderDict(
      "{'descr': '<f4', 'fortran_order': False, 'shape': (), }") ==
      (("<f4", false, Seq.empty[Long])))
    intercept[RuntimeException](Npy.parseHeaderDict("{'descr': '<f8'}"))
    intercept[RuntimeException](Npy.parseHeaderDict(
      "{'descr': '<f8', 'fortran_order': Maybe, 'shape': (3,), }"))
    intercept[RuntimeException](Npy.parseHeaderDict(
      "{'descr': '<f8', 'fortran_order': False, 'shape': (3,), 'extra': 1, }"))
  }

  test("a shape product that would wrap Long quarantines (per-dimension bound)") {
    // build a v1 npy whose declared shape is (16777216, 1099511627776):
    // the product wraps to 0 and would otherwise pass the empty-payload check
    val dict = "{'descr': '<f8', 'fortran_order': False, 'shape': (16777216, 1099511627776), }"
    val unpadded = 10 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x93)
    out.write("NUMPY".getBytes("ISO-8859-1"), 0, 5)
    out.write(1); out.write(0)
    out.write(header.length & 0xff); out.write((header.length >> 8) & 0xff)
    out.write(header.getBytes("ISO-8859-1"), 0, header.length)
    assert(Npy.parseFileSafe(0L, out.toByteArray).isEmpty,
      "astronomical shapes must quarantine, not wrap")
  }

  test("damage ladder: magic, version, alignment, payload size, zip member names") {
    val id = 0L // an npy arm
    assert(!Npy.isNpz(id))
    val good = Npy.renderFile(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Npy.parseFileSafe(id, mut(0, 'X'.toByte)).isEmpty, "magic")
    assert(Npy.parseFileSafe(id, mut(6, 9.toByte)).isEmpty, "major version")
    assert(Npy.parseFileSafe(id, good.take(good.length - 1)).isEmpty, "payload size")
    assert(Npy.parseFileSafe(id, good ++ Array[Byte](0)).isEmpty, "trailing byte")
    assert(Npy.parseFileSafe(id, good.take(12)).isEmpty, "truncation")
    assert(Npy.parseFileSafe(id, Array.emptyByteArray).isEmpty)
    // an npz with a non-npy member quarantines whole
    val bad = Zip.buildZip(Seq(("arr_0.npy", Npy.renderNpy(2L, 0), 0),
      ("readme.txt", "not an array".getBytes("UTF-8"), 0)))
    assert(Npy.parseFileSafe(2L, bad).isEmpty, "foreign npz member")
  }

  test("operator: damaged file quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Npy.encodeNpy(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 3)) else (id, b)
    }.toDF("doc_id", "npy")
    val got = Npy.npyMeta(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    for (id <- (0L until 24L) if id != 8L)
      assert(byDoc(id).length == Npy.nArrays(id), s"npy $id")
  }
}
