package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class GgufSpec extends AnyFunSuite {

  test("round-trip: typed KVs + tensor infos + F32/F16 + Q8_0/Q4_0 recover the closed forms") {
    for (id <- 0L until 96L) {
      val rows = Gguf.parseGguf(id, Gguf.renderGguf(id))
      assert(rows.length == Gguf.nTensors(id) + 1, s"gguf $id tensor count")
      assert(rows.forall(_.arch == Gguf.archOf(id)), s"gguf $id arch")
      assert(rows.forall(_.n_kv == 6), s"gguf $id kv count")
      for (j <- 0 until Gguf.nTensors(id)) {
        val t = rows.find(_.tensor == s"blk.$j.weight").getOrElse(fail(s"gguf $id t$j"))
        val shape = Gguf.shapeOf(id, j)
        assert(t.ggml_type == (if (Gguf.dtypeOf(id, j) == 0) "F32" else "F16"), s"gguf $id t$j type")
        assert(t.n_dims == shape.length && t.n_elems == shape.product, s"gguf $id t$j shape")
        assert(t.vtype == "f", s"gguf $id t$j decodable")
        val expected = (0 until shape.product.toInt).map(Gguf.elemValue(id, j, _)).sum
        assert(t.val_sum.contains(expected), s"gguf $id t$j sum")
      }
      // the quantized tensor dequantizes exactly (dyadic scale × int lanes)
      val q = rows.find(_.tensor == "blk.q.weight").getOrElse(fail(s"gguf $id q"))
      assert(q.ggml_type == (if (id % 2 == 0) "Q8_0" else "Q4_0"), s"gguf $id q type")
      assert(q.n_elems == Gguf.qElemsOf(id) && q.vtype == "f", s"gguf $id q shape")
      val d = Gguf.qScaleOf(id)
      val expected = (0 until Gguf.qElemsOf(id)).map { e =>
        if (id % 2 == 0) d * Gguf.q8Of(id, e) else d * (Gguf.q4RawOf(id, e) - 8)
      }.sum
      assert(q.val_sum.contains(expected), s"gguf $id q sum ${q.val_sum} vs $expected")
    }
    // both quantizations and both block counts occur across the sweep
    assert((0L until 96L).exists(id => id % 2 == 0 && Gguf.qElemsOf(id) == 64), "2-block Q8_0")
    assert((0L until 96L).exists(id => id % 2 == 1 && Gguf.qElemsOf(id) == 64), "2-block Q4_0")
  }

  test("alignment is consumed from the KV and enforced on offsets") {
    val good = Gguf.renderGguf(2L)
    assert(Gguf.parseGguf(2L, good).nonEmpty)
    // corrupt general.alignment's value (u32 at its KV) to a non-power-of-two
    val key = "general.alignment".getBytes("UTF-8")
    val at = good.indexOfSlice(key)
    assert(at > 0)
    val bad = good.clone()
    bad(at + key.length + 4) = 33.toByte // value after the 4-byte type tag
    assert(Gguf.parseGgufSafe(2L, bad).isEmpty, "non-power-of-two alignment quarantines")
  }

  test("bool ARRAY elements carry the 0/1 rule, same as scalar bools") {
    // rebuild the fixture's i32 array kv as a bool array with a 7 in it:
    // craft a minimal file manually — header + one bad kv quarantines
    // before tensors are reached
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def gstr(s: String): Unit = {
      val b = s.getBytes("UTF-8"); le(b.length.toLong, 8); out.write(b, 0, b.length)
    }
    out.write("GGUF".getBytes("ISO-8859-1"), 0, 4)
    le(3L, 4); le(0L, 8); le(1L, 8)
    gstr("graft.flags"); le(9L, 4) // array
    le(7L, 4) // elem type bool
    le(2L, 8) // two elements
    out.write(1); out.write(7) // the second is out of range
    assert(Gguf.parseGgufSafe(1L, out.toByteArray).isEmpty,
      "a non-0/1 bool array element quarantines")
  }

  test("damage ladder: magic, version, kv type, bool range, offsets, truncation") {
    val id = 7L
    val good = Gguf.renderGguf(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Gguf.parseGgufSafe(id, mut(0, 'X'.toByte)).isEmpty, "magic")
    assert(Gguf.parseGgufSafe(id, mut(4, 9.toByte)).isEmpty, "version")
    assert(Gguf.parseGgufSafe(id, good.take(good.length - 1)).isEmpty, "EOF rule")
    assert(Gguf.parseGgufSafe(id, good ++ Array[Byte](0)).isEmpty, "trailing byte")
    assert(Gguf.parseGgufSafe(id, good.take(30)).isEmpty, "truncation")
    assert(Gguf.parseGgufSafe(id, Array.emptyByteArray).isEmpty)
    // the bool kv must be 0/1: find "graft.tied" and smash its value
    val key = "graft.tied".getBytes("UTF-8")
    val at = good.indexOfSlice(key)
    val bad = good.clone()
    bad(at + key.length + 4) = 7.toByte
    assert(Gguf.parseGgufSafe(id, bad).isEmpty, "bool out of range")
  }

  test("operator: damaged file quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Gguf.encodeGguf(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 5)) else (id, b)
    }.toDF("doc_id", "gguf")
    val got = Gguf.ggufMeta(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    for (id <- (0L until 24L) if id != 8L)
      assert(byDoc(id).length == Gguf.nTensors(id) + 1, s"gguf $id")
  }
}
