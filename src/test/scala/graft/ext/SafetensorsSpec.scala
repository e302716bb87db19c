package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class SafetensorsSpec extends AnyFunSuite {

  test("round-trip: header + offsets + all four dtype arms recover the closed forms") {
    val dtypes = scala.collection.mutable.Set[String]()
    for (id <- 0L until 96L) {
      val rows = Safetensors.parseSafetensors(id, Safetensors.renderSafetensors(id))
      assert(rows.length == Safetensors.nTensors(id), s"st $id tensor count")
      for (j <- 0 until Safetensors.nTensors(id)) {
        val t = rows.find(_.tensor == s"t$j").getOrElse(fail(s"st $id t$j missing"))
        val shape = Safetensors.shapeOf(id, j)
        assert(t.dtype == Safetensors.dtypeOf(id, j), s"st $id t$j dtype")
        dtypes += t.dtype
        assert(t.n_dims == shape.length, s"st $id t$j dims")
        assert(t.n_elems == shape.product, s"st $id t$j elems")
        val expected = (0 until shape.product).map(Safetensors.elemValue(id, j, _)).sum
        assert(t.val_sum == expected, s"st $id t$j sum (exact: quarter steps)")
      }
    }
    assert(dtypes == Set("F32", "F16", "I64", "BF16"), "all dtype arms occur")
  }

  test("__metadata__ is skipped but validated; a non-string map is damage") {
    val good = Safetensors.renderSafetensors(0L)
    assert(Safetensors.parseSafetensors(0L, good).nonEmpty)
    // splice a numeric metadata value: {"__metadata__":{"format":1,...
    val s = new String(good.drop(8), "UTF-8")
    val patched = s.replace(""""format":"pt"""", """"format":11""")
    assert(patched != s)
    val hb = patched.getBytes("UTF-8")
    // header length unchanged: "pt" (4 chars incl quotes) vs 11 + 2 spaces? rebuild properly
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    // recompute: take original data section length from the original header len
    var hlen = 0L
    var k = 7
    while (k >= 0) { hlen = (hlen << 8) | (good(k) & 0xffL); k -= 1 }
    val header = new String(good, 8, hlen.toInt, "UTF-8")
    val data = good.drop(8 + hlen.toInt)
    val badHeader = header.replace(""""format":"pt"""", """"format":11""").getBytes("UTF-8")
    val bhl = badHeader.length.toLong
    while (i < 8) { out.write(((bhl >>> (8 * i)) & 0xff).toInt); i += 1 }
    out.write(badHeader, 0, badHeader.length)
    out.write(data, 0, data.length)
    assert(Safetensors.parseSafetensorsSafe(0L, out.toByteArray).isEmpty,
      "numeric __metadata__ value quarantines")
  }

  test("offset coverage: gaps, overlaps, and shape/span mismatches quarantine") {
    def rebuild(id: Long, mutate: String => String): Array[Byte] = {
      val good = Safetensors.renderSafetensors(id)
      var hlen = 0L
      var k = 7
      while (k >= 0) { hlen = (hlen << 8) | (good(k) & 0xffL); k -= 1 }
      val header = mutate(new String(good, 8, hlen.toInt, "UTF-8"))
      val hb = header.getBytes("UTF-8")
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      val hl = hb.length.toLong
      while (i < 8) { out.write(((hl >>> (8 * i)) & 0xff).toInt); i += 1 }
      out.write(hb, 0, hb.length)
      out.write(good, 8 + hlen.toInt, good.length - 8 - hlen.toInt)
      out.toByteArray
    }
    // find an id with >= 2 tensors so a gap is expressible
    val id = (0L until 96L).find(Safetensors.nTensors(_) >= 2).get
    val good = Safetensors.renderSafetensors(id)
    assert(Safetensors.parseSafetensors(id, good).nonEmpty)
    // shift t0's end down by one: gap AND span mismatch
    val h = {
      var hlen = 0L
      var k = 7
      while (k >= 0) { hlen = (hlen << 8) | (good(k) & 0xffL); k -= 1 }
      new String(good, 8, hlen.toInt, "UTF-8")
    }
    val m = """"data_offsets":\[0,(\d+)\]""".r
    val end0 = m.findFirstMatchIn(h).get.group(1).toInt
    val gapped = rebuild(id, _.replace(s""""data_offsets":[0,$end0]""",
      s""""data_offsets":[1,$end0]"""))
    assert(Safetensors.parseSafetensorsSafe(id, gapped).isEmpty, "a leading gap quarantines")
    val shrunk = rebuild(id, _.replace(s""""data_offsets":[0,$end0]""",
      s""""data_offsets":[0,${end0 - 1}]"""))
    assert(Safetensors.parseSafetensorsSafe(id, shrunk).isEmpty, "span/shape mismatch quarantines")
  }

  test("damage ladder: header length, JSON garbage, unknown dtype, truncation") {
    val id = 7L
    val good = Safetensors.renderSafetensors(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Safetensors.parseSafetensorsSafe(id, mut(0, 0x7f.toByte)).isEmpty, "header length")
    assert(Safetensors.parseSafetensorsSafe(id, mut(9, '!'.toByte)).isEmpty, "JSON garbage")
    assert(Safetensors.parseSafetensorsSafe(id, good.take(6)).isEmpty, "truncation")
    assert(Safetensors.parseSafetensorsSafe(id, good.take(good.length - 1)).isEmpty,
      "lost data byte (coverage rule)")
    assert(Safetensors.parseSafetensorsSafe(id, Array.emptyByteArray).isEmpty)
  }

  test("duplicate JSON keys are damage, not last-wins") {
    // a duplicated field (dtype/shape/data_offsets) silently last-wins via
    // .toMap and a duplicated tensor name yields two rows — the strict-header
    // contract requires quarantine instead
    def withHeader(json: String, data: Array[Byte]): Array[Byte] = {
      val h = json.getBytes("UTF-8")
      val out = new java.io.ByteArrayOutputStream()
      (0 until 8).foreach(i => out.write(((h.length.toLong >>> (8 * i)) & 0xff).toInt))
      out.write(h, 0, h.length); out.write(data, 0, data.length)
      out.toByteArray
    }
    val data = new Array[Byte](8)
    val clean = withHeader(
      """{"t":{"dtype":"I64","shape":[1],"data_offsets":[0,8]}}""", data)
    assert(Safetensors.parseSafetensorsSafe(1L, clean).nonEmpty, "baseline accepts")
    val dupField = withHeader(
      """{"t":{"dtype":"F32","dtype":"I64","shape":[1],"data_offsets":[0,8]}}""", data)
    assert(Safetensors.parseSafetensorsSafe(1L, dupField).isEmpty, "duplicate dtype")
    val dupTensor = withHeader(
      """{"t":{"dtype":"I64","shape":[1],"data_offsets":[0,8]},""" +
        """"t":{"dtype":"I64","shape":[1],"data_offsets":[0,8]}}""", data)
    assert(Safetensors.parseSafetensorsSafe(1L, dupTensor).isEmpty, "duplicate tensor name")
  }

  test("operator: damaged file quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Safetensors.encodeSafetensors(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 2)) else (id, b)
    }.toDF("doc_id", "st")
    val got = Safetensors.safetensorsMeta(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    for (id <- (0L until 24L) if id != 8L)
      assert(byDoc(id).length == Safetensors.nTensors(id), s"st $id")
  }
}
