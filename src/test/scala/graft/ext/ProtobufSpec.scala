package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class ProtobufSpec extends AnyFunSuite {

  test("round-trip: every fixture stream recovers its closed forms") {
    for (id <- 0L until 96L) {
      val fields = Protobuf.scanStream(id, Protobuf.renderStream(id))
      val byMsg = fields.groupBy(_.msg_idx)
      assert(byMsg.size == Protobuf.nMsgs(id), s"proto $id msg count")
      byMsg.toSeq.sortBy(_._1).foreach { case (mi, fs) =>
        val m = mi.toInt
        val packed = Protobuf.hasPacked(id, m)
        assert(fs.length == (if (packed) 8 else 7), s"proto $id m$m field count")
        def at(i: Int) = fs.find(_.elem_idx == i).get
        assert(at(0).field_no == 1 && at(0).wire_type == 0
          && at(0).varint_val == Protobuf.seqOf(id, m), s"proto $id m$m seq")
        val name = Protobuf.nameOf(id, m).getBytes("UTF-8")
        assert(at(1).field_no == 2 && at(1).wire_type == 2 && at(1).len == name.length
          && at(1).checksum == cks(name), s"proto $id m$m name")
        assert(at(2).field_no == 3 && at(2).wire_type == 1
          && at(2).varint_val == Protobuf.f64Of(id, m) && at(2).len == 8, s"proto $id m$m f64")
        assert(at(3).field_no == 4 && at(3).wire_type == 5
          && at(3).varint_val == Protobuf.f32Of(id, m) && at(3).len == 4, s"proto $id m$m f32")
        val note = Protobuf.noteOf(id, m).getBytes("UTF-8")
        val nested = Array[Byte](0x08, Protobuf.kOf(id, m).toByte, 0x12, note.length.toByte) ++ note
        assert(at(4).field_no == 5 && at(4).wire_type == 2 && at(4).len == nested.length
          && at(4).checksum == cks(nested), s"proto $id m$m nested")
        assert(at(5).field_no == 6 && at(5).varint_val == Protobuf.boolOf(id, m), s"proto $id m$m bool")
        if (packed) {
          assert(at(6).field_no == 7 && at(6).wire_type == 2 && at(6).len == 3
            && at(6).checksum == cks(Protobuf.packedOf(m).map(_.toByte).toArray),
            s"proto $id m$m packed")
        }
        val wide = Protobuf.wideOf(id, m).getBytes("UTF-8")
        val last = at(if (packed) 7 else 6)
        assert(last.field_no == 16 && last.wire_type == 2 && last.len == wide.length
          && last.checksum == cks(wide), s"proto $id m$m wide tag")
      }
    }
  }

  private def cks(b: Array[Byte]): Long = {
    var c = 0L
    b.foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
    c
  }

  test("CodedInputStream differential: the wire reader agrees field-for-field") {
    // orc-core ships google's protobuf runtime shaded at
    // org.apache.orc.protobuf — the same in-JVM-differential channel the
    // ORC suite already rides
    import org.apache.orc.protobuf.CodedInputStream
    for (id <- 0L until 48L) {
      val stream = Protobuf.renderStream(id)
      val ours = Protobuf.scanStream(id, stream)
      val cis = CodedInputStream.newInstance(stream)
      var msgIdx = 0L
      val theirs = Vector.newBuilder[(Long, Long, Long, Long, Long, Long)]
      while (!cis.isAtEnd) {
        val msgLen = cis.readRawVarint32()
        val limit = cis.pushLimit(msgLen)
        var elem = 0L
        while (!cis.isAtEnd) {
          val tag = cis.readTag()
          val field = (tag >>> 3).toLong
          (tag & 7) match {
            case 0 =>
              theirs += ((msgIdx, elem, field, 0L, cis.readRawVarint64(), 0L))
            case 1 =>
              theirs += ((msgIdx, elem, field, 1L, cis.readRawLittleEndian64(), 8L))
            case 5 =>
              theirs += ((msgIdx, elem, field, 5L, cis.readRawLittleEndian32() & 0xffffffffL, 4L))
            case 2 =>
              val b = cis.readByteArray()
              theirs += ((msgIdx, elem, field, 2L, 0L, b.length.toLong))
            case x => throw new IllegalStateException(s"wire $x")
          }
          elem += 1
        }
        cis.popLimit(limit)
        msgIdx += 1
      }
      val mine = ours.map(f => (f.msg_idx, f.elem_idx, f.field_no, f.wire_type, f.varint_val, f.len))
      assert(mine == theirs.result(), s"proto $id differential")
    }
  }

  test("wire damage: groups, field 0, straddles, trailing garbage, overlong varints") {
    val good = Protobuf.renderStream(3L)
    assert(Protobuf.scanStreamSafe(3L, good).nonEmpty)
    assert(Protobuf.scanStreamSafe(3L, good.dropRight(1)).isEmpty, "truncation")
    assert(Protobuf.scanStreamSafe(3L, good ++ Array[Byte](1)).isEmpty,
      "trailing garbage (a 1-byte 'message' whose tag straddles)")
    // hand-built single messages, delimited framing
    def stream(msg: Array[Byte]): Array[Byte] = Array(msg.length.toByte) ++ msg
    def scans(msg: Array[Byte]): Boolean = Protobuf.scanStreamSafe(0L, stream(msg)).nonEmpty
    assert(scans(Array[Byte](0x08, 0x01)), "minimal varint field")
    assert(!scans(Array[Byte](0x0b)), "wire type 3 (group start) is damage")
    assert(!scans(Array[Byte](0x0c)), "wire type 4 (group end) is damage")
    assert(!scans(Array[Byte](0x0e)), "wire type 6 is damage")
    assert(!scans(Array[Byte](0x00, 0x01)), "field 0 is damage")
    assert(!scans(Array[Byte](0x08)), "varint value missing")
    assert(!scans(Array[Byte](0x12, 0x05, 'a', 'b')), "declared length past message end")
    assert(!scans(Array[Byte](0x09, 1, 2, 3)), "fixed64 straddling message end")
    assert(!scans(Array[Byte](0x15, 1, 2, 3)), "fixed32 straddling message end")
    // an 11-byte varint (shift past 63) is damage
    val overlong = Array.fill[Byte](10)(0x80.toByte) :+ 0x01.toByte
    assert(!scans(Array[Byte](0x08) ++ overlong), "overlong varint is damage")
    // a message length that straddles the stream
    assert(Protobuf.scanStreamSafe(0L, Array[Byte](0x05, 0x08, 0x01)).isEmpty,
      "delimited length past stream end")
  }

  test("multi-byte tags decode (field 16 rides a two-byte tag)") {
    val fields = Protobuf.scanStream(1L, Protobuf.renderStream(1L))
    assert(fields.exists(_.field_no == 16), "field 16 surfaced")
    // and a very large field number round-trips
    val w = Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x0f, 0x2a) // field 536870911, wire 0, value 42
    val s = Array(w.length.toByte) ++ w
    val recs = Protobuf.scanStreamSafe(0L, s)
    assert(recs.length == 1 && recs.head.field_no == 536870911L && recs.head.varint_val == 42L)
  }
}
