package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class CborSpec extends AnyFunSuite {

  private def cks(b: Array[Byte]): Long = {
    var c = 0L
    b.foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
    c
  }

  test("round-trip: every fixture document recovers its closed forms") {
    for (id <- 0L until 96L) {
      val r = Cbor.parseCbor(id, Cbor.renderCbor(id))
      assert(r.n_keys == 9, s"cbor $id keys")
      assert(r.seq == Cbor.seqOf(id), s"cbor $id seq")
      assert(r.name == Cbor.nameOf(id), s"cbor $id name")
      assert(r.neg == Cbor.negOf(id), s"cbor $id neg")
      assert(r.score == Cbor.scoreOf(id), s"cbor $id score")
      assert(r.ok == Cbor.okOf(id), s"cbor $id ok")
      assert(r.has_nil, s"cbor $id nil")
      assert(r.n_tags == Cbor.nTagsOf(id) &&
        r.tags == (0 until Cbor.nTagsOf(id)).map(Cbor.tagOf(id, _)).mkString(","), s"cbor $id tags")
      assert(r.meta_k == Cbor.metaKOf(id) && r.meta_ts == Cbor.metaTsOf(id), s"cbor $id meta")
      assert(r.blob_len == Cbor.blobLenOf(id) && r.blob_checksum == cks(Cbor.blobOf(id)),
        s"cbor $id blob")
    }
  }

  test("argument widths: all five lanes decode, non-minimal is damage") {
    def value(b: Array[Byte]): Option[Cbor.CV] =
      try { val (v, e) = Cbor.parseValue(b, 0, 0); if (e == b.length) Some(v) else None }
      catch { case scala.util.control.NonFatal(_) => None }
    def B(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(value(B(0x17)).contains(Cbor.CInt(23)), "immediate")
    assert(value(B(0x18, 0x18)).contains(Cbor.CInt(24)), "1-byte")
    assert(value(B(0x19, 0x01, 0x00)).contains(Cbor.CInt(256)), "2-byte")
    assert(value(B(0x1a, 0x00, 0x01, 0x00, 0x00)).contains(Cbor.CInt(65536)), "4-byte")
    assert(value(B(0x1b, 0, 0, 0, 1, 0, 0, 0, 0)).contains(Cbor.CInt(4294967296L)), "8-byte")
    // each width holding a value that fits the next smaller is damage
    assert(value(B(0x18, 0x17)).isEmpty, "1-byte arg < 24")
    assert(value(B(0x19, 0x00, 0xff)).isEmpty, "2-byte arg < 256")
    assert(value(B(0x1a, 0, 0, 0xff, 0xff)).isEmpty, "4-byte arg < 65536")
    assert(value(B(0x1b, 0, 0, 0, 0, 0xff, 0xff, 0xff, 0xff)).isEmpty, "8-byte arg < 2^32")
    // negint lane
    assert(value(B(0x20)).contains(Cbor.CInt(-1)), "-1")
    assert(value(B(0x38, 0x18)).contains(Cbor.CInt(-25)), "-25 via 1-byte arg")
    // uints in [2^63, 2^64) are RFC-valid but don't fit the signed-Long
    // lane: quarantine, never a silently-negative value (review finding)
    assert(value(B(0x1b, 0x80, 0, 0, 0, 0, 0, 0, 0)).isEmpty, "2^63 quarantines")
    assert(value(B(0x3b, 0x80, 0, 0, 0, 0, 0, 0, 0)).isEmpty, "-1-2^63 quarantines")
  }

  test("canonical map/simple rules: order, duplicates, indefinite, reserved") {
    def value(b: Array[Byte]): Option[Cbor.CV] =
      try { val (v, e) = Cbor.parseValue(b, 0, 0); if (e == b.length) Some(v) else None }
      catch { case scala.util.control.NonFatal(_) => None }
    def B(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // {"a": 1, "b": 2} sorted vs swapped
    assert(value(B(0xa2, 0x61, 'a', 0x01, 0x61, 'b', 0x02)).isDefined, "sorted keys")
    assert(value(B(0xa2, 0x61, 'b', 0x01, 0x61, 'a', 0x02)).isEmpty, "unsorted keys")
    assert(value(B(0xa2, 0x61, 'a', 0x01, 0x61, 'a', 0x02)).isEmpty, "duplicate keys")
    // §4.2.1 length-first: "b" < "aa" in encoded order (0x61 < 0x62 head bytes)
    assert(value(B(0xa2, 0x61, 'b', 0x01, 0x62, 'a', 'a', 0x02)).isDefined,
      "shorter text key first (encoded-bytes order)")
    assert(value(B(0x9f, 0x01, 0xff)).isEmpty, "indefinite array is damage")
    assert(value(B(0x5f, 0x41, 0x01, 0xff)).isEmpty, "indefinite bytes is damage")
    assert(value(B(0xf8, 0x14)).isEmpty, "simple 20 in 1-byte form is damage")
    assert(value(B(0xf7)).isEmpty, "undefined (23) out of scope")
    assert(value(B(0xf9, 0x3c, 0x00)).isEmpty, "float16 out of scope")
    assert(value(B(0xfa, 0x3f, 0x80, 0x00, 0x00)).isEmpty, "float32 out of scope")
    assert(value(B(0x1c)).isEmpty, "reserved additional info 28")
    assert(value(B(0xc0, 0x61, 'x')).isEmpty, "tag 0 out of scope")
    assert(value(B(0xc1, 0x01)).isDefined, "tag 1 epoch decodes")
    assert(value(B(0x62, 0xc3, 0x28)).isEmpty, "invalid UTF-8 text is damage")
  }

  test("framing: truncation, trailing garbage, depth bomb") {
    val good = Cbor.renderCbor(5L)
    assert(Cbor.parseCborSafe(5L, good).nonEmpty)
    assert(Cbor.parseCborSafe(5L, good.dropRight(1)).isEmpty, "truncation")
    assert(Cbor.parseCborSafe(5L, good ++ Array[Byte](0)).isEmpty, "trailing garbage")
    assert(Cbor.parseCborSafe(5L, Array.emptyByteArray).isEmpty, "empty")
    val bomb = Array.fill[Byte](100)(0x81.toByte) :+ 0x01.toByte // [[[...1]]]
    assert(Cbor.parseCborSafe(5L, bomb).isEmpty, "depth bomb quarantines")
  }
}
