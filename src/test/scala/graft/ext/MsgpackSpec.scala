package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class MsgpackSpec extends AnyFunSuite {

  private def cks(b: Array[Byte]): Long = {
    var c = 0L
    b.foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
    c
  }

  test("round-trip: every fixture document recovers its closed forms") {
    for (id <- 0L until 96L) {
      val r = Msgpack.parseMsgpack(id, Msgpack.renderMsgpack(id))
      assert(r.n_keys == 9, s"msgpack $id keys")
      assert(r.seq == Msgpack.seqOf(id), s"msgpack $id seq")
      assert(r.name == Msgpack.nameOf(id), s"msgpack $id name")
      assert(r.neg == Msgpack.negOf(id), s"msgpack $id neg")
      assert(r.score == Msgpack.scoreOf(id), s"msgpack $id score")
      assert(r.ok == Msgpack.okOf(id), s"msgpack $id ok")
      assert(r.has_nil, s"msgpack $id nil")
      assert(r.n_tags == Msgpack.nTagsOf(id) &&
        r.tags == (0 until Msgpack.nTagsOf(id)).map(Msgpack.tagOf(id, _)).mkString(","),
        s"msgpack $id tags")
      assert(r.meta_k == Msgpack.metaKOf(id), s"msgpack $id meta_k")
      assert(r.ts_sec == Msgpack.tsSecOf(id) && r.ts_nanos == Msgpack.tsNanosOf(id),
        s"msgpack $id timestamp")
      assert(r.blob_len == Msgpack.blobLenOf(id) && r.blob_checksum == cks(Msgpack.blobOf(id)),
        s"msgpack $id blob")
    }
  }

  test("int families: all lanes decode, non-minimal widths are damage") {
    def value(b: Array[Byte]): Option[Msgpack.MV] =
      try { val (v, e) = Msgpack.parseValue(b, 0, 0); if (e == b.length) Some(v) else None }
      catch { case scala.util.control.NonFatal(_) => None }
    def B(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(value(B(0x7f)).contains(Msgpack.MInt(127)), "positive fixint")
    assert(value(B(0xe0)).contains(Msgpack.MInt(-32)), "negative fixint")
    assert(value(B(0xcc, 0x80)).contains(Msgpack.MInt(128)), "uint8")
    assert(value(B(0xcd, 0x01, 0x00)).contains(Msgpack.MInt(256)), "uint16")
    assert(value(B(0xce, 0, 1, 0, 0)).contains(Msgpack.MInt(65536)), "uint32")
    assert(value(B(0xcf, 0, 0, 0, 1, 0, 0, 0, 0)).contains(Msgpack.MInt(4294967296L)), "uint64")
    assert(value(B(0xd0, 0x80)).contains(Msgpack.MInt(-128)), "int8")
    assert(value(B(0xd1, 0xff, 0x00)).contains(Msgpack.MInt(-256)), "int16")
    // non-minimal: each wider lane holding a narrower value
    assert(value(B(0xcc, 0x7f)).isEmpty, "uint8 holding a fixint")
    assert(value(B(0xcd, 0x00, 0xff)).isEmpty, "uint16 holding a uint8")
    assert(value(B(0xce, 0, 0, 0xff, 0xff)).isEmpty, "uint32 holding a uint16")
    assert(value(B(0xcf, 0, 0, 0, 0, 0xff, 0xff, 0xff, 0xff)).isEmpty, "uint64 holding a uint32")
    assert(value(B(0xd0, 0xe0)).isEmpty, "int8 holding a negative fixint")
    assert(value(B(0xd1, 0xff, 0x80)).isEmpty, "int16 holding an int8")
    // uint64 in [2^63, 2^64): doesn't fit the signed-Long lane
    assert(value(B(0xcf, 0x80, 0, 0, 0, 0, 0, 0, 0)).isEmpty, "2^63 quarantines")
  }

  test("structural rules: 0xc1, duplicate keys, float32, foreign exts, UTF-8") {
    def value(b: Array[Byte]): Option[Msgpack.MV] =
      try { val (v, e) = Msgpack.parseValue(b, 0, 0); if (e == b.length) Some(v) else None }
      catch { case scala.util.control.NonFatal(_) => None }
    def B(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(value(B(0xc1)).isEmpty, "0xc1 is never used")
    assert(value(B(0x82, 0xa1, 'a', 1, 0xa1, 'a', 2)).isEmpty, "duplicate map keys")
    assert(value(B(0x82, 0xa1, 'a', 1, 0xa1, 'b', 2)).isDefined, "distinct keys parse")
    assert(value(B(0x81, 0x01, 0x02)).isEmpty, "non-string map key")
    assert(value(B(0xca, 0x3f, 0x80, 0, 0)).isEmpty, "float32 out of scope")
    assert(value(B(0xd4, 0x05, 0x00)).isEmpty, "fixext1 with a foreign type")
    assert(value(B(0xd6, 0x05, 0, 0, 0, 0)).isEmpty, "fixext4 with a non-timestamp type")
    assert(value(B(0xa2, 0xc3, 0x28)).isEmpty, "invalid UTF-8 fixstr")
    assert(value(B(0xd9, 0x10) ++ Array.fill[Byte](16)('a')).isEmpty,
      "str8 holding a fixstr-able length")
  }

  test("timestamp shapes: fixext4, fixext8, minimality, nanos bound") {
    def value(b: Array[Byte]): Option[Msgpack.MV] =
      try { val (v, e) = Msgpack.parseValue(b, 0, 0); if (e == b.length) Some(v) else None }
      catch { case scala.util.control.NonFatal(_) => None }
    def B(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(value(B(0xd6, 0xff, 0x65, 0x00, 0x00, 0x00))
      .contains(Msgpack.MTimestamp(0x65000000L, 0L)), "fixext4 seconds")
    // fixext8: nanos=1, sec=2 → (1 << 34) | 2
    val v = (1L << 34) | 2L
    val f8 = B(0xd7, 0xff) ++ (7 to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    assert(value(f8).contains(Msgpack.MTimestamp(2L, 1L)), "fixext8")
    // fixext8 with nanos=0 and a 4-byte-able sec: non-minimal shape
    val f8bad = B(0xd7, 0xff) ++ Array.fill[Byte](4)(0) ++ B(0x00, 0x00, 0x00, 0x05)
    assert(value(f8bad).isEmpty, "fixext8 holding a fixext4-able timestamp")
    // nanos >= 10^9 is damage (999999999 + 1): nanos field = 10^9
    val bad = (1000000000L << 34) | 2L
    val f8n = B(0xd7, 0xff) ++ (7 to 0 by -1).map(i => ((bad >>> (8 * i)) & 0xff).toByte).toArray
    assert(value(f8n).isEmpty, "nanos out of range")
    // timestamp96: u32 nanos THEN i64 sec (review finding: sec was read
    // at the nanos offset). sec = 2^34 (too big for fixext8), nanos = 7
    val sec = 1L << 34
    val t96 = B(0xc7, 12, 0xff, 0, 0, 0, 7) ++
      (7 to 0 by -1).map(i => ((sec >>> (8 * i)) & 0xff).toByte).toArray
    assert(value(t96).contains(Msgpack.MTimestamp(sec, 7L)), "timestamp96 field order")
    // and a NEGATIVE sec (pre-1970) in the 96-bit shape
    val neg = B(0xc7, 12, 0xff, 0, 0, 0, 0) ++ Array.fill[Byte](8)(0xff.toByte)
    assert(value(neg).contains(Msgpack.MTimestamp(-1L, 0L)), "timestamp96 negative seconds")
  }

  test("framing: truncation, trailing garbage, depth bomb") {
    val good = Msgpack.renderMsgpack(5L)
    assert(Msgpack.parseMsgpackSafe(5L, good).nonEmpty)
    assert(Msgpack.parseMsgpackSafe(5L, good.dropRight(1)).isEmpty, "truncation")
    assert(Msgpack.parseMsgpackSafe(5L, good ++ Array[Byte](0)).isEmpty, "trailing garbage")
    assert(Msgpack.parseMsgpackSafe(5L, Array.emptyByteArray).isEmpty, "empty")
    val bomb = Array.fill[Byte](100)(0x91.toByte) :+ 0x01.toByte
    assert(Msgpack.parseMsgpackSafe(5L, bomb).isEmpty, "depth bomb quarantines")
  }
}
