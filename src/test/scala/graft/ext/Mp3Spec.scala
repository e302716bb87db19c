package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class Mp3Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("frame walk: sizes, offsets, tags resolve exactly for every arm") {
    for (id <- 0L until 12L) {
      val data = s"mpeg audio doc $id payload".getBytes("UTF-8")
      val frames = Mp3.parseMp3(Mp3.mp3For(id, data)).get
      val nf = 1 + (id % 5).toInt
      assert(frames.length == nf, s"doc $id")
      var off = if (id % 2 == 0) 30L else 0L
      frames.zipWithIndex.foreach { case (f, k) =>
        val (bi, si, pad) = Mp3.frameSpec(id, k)
        assert(f.offset == off, s"doc $id frame $k offset")
        assert(f.size == Mp3.frameSize(bi, si, pad))
        assert(!f.hasCrc)
        off += f.size
      }
    }
  }

  test("protection-bit frames (CRC present) are counted, not rejected") {
    val data = "crc frame".getBytes("UTF-8")
    val plain = Mp3.mp3For(1L, data) // no ID3v2 (odd id)
    val withCrc = plain.clone()
    withCrc(1) = (withCrc(1) & 0xfe).toByte // clear the protection bit
    val frames = Mp3.parseMp3(withCrc).get
    assert(frames.head.hasCrc && frames.head.size == Mp3.parseMp3(plain).get.head.size)
  }

  test("malformed streams drop: lost sync, reserved fields, truncation, bad syncsafe, no frames") {
    val good = Mp3.mp3For(2L, "hello mpeg".getBytes("UTF-8")) // has ID3v2
    assert(Mp3.parseMp3(good).isDefined)
    def bad(mut: Array[Byte] => Unit): Array[Byte] = { val b = good.clone(); mut(b); b }
    assert(Mp3.parseMp3(bad(_(30) = 0x00)).isEmpty, "lost sync") // first frame header byte
    assert(Mp3.parseMp3(bad(b => b(32) = (b(32) | 0xf0).toByte)).isEmpty, "bitrate index 15")
    assert(Mp3.parseMp3(bad(b => b(32) = (b(32) | 0x0c).toByte)).isEmpty, "reserved sample rate")
    assert(Mp3.parseMp3(bad(b => b(31) = (b(31) & 0xe7).toByte)).isEmpty, "MPEG-2 version out of subset")
    assert(Mp3.parseMp3(good.take(good.length - 3)).isEmpty, "truncated last frame")
    assert(Mp3.parseMp3(bad(_(6) = 0x80.toByte)).isEmpty, "syncsafe byte with the top bit set")
    // a tag with no frames at all
    assert(Mp3.parseMp3(good.take(30)).isEmpty)
    assert(Mp3.parseMp3(Array.empty).isEmpty)
  }

  test("ID3v1 trailer is excluded from the frame region") {
    val id = 5L // id % 4 == 1: trailer present; odd: no ID3v2
    val data = "trailer doc".getBytes("UTF-8")
    val bytes = Mp3.mp3For(id, data)
    assert(bytes.length >= 128 && bytes(bytes.length - 128) == 'T')
    val frames = Mp3.parseMp3(bytes).get
    val lastEnd = frames.last.offset + frames.last.size
    assert(lastEnd == bytes.length - 128, "frames tile exactly up to the trailer")
  }

  test("end-to-end over the table: checksums match the plane model; partition-stable") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, if (i % 11 == 0) null else s"audio body $i")).toDF("doc_id", "text")
    val out = Mp3.mp3Frames(Mp3.encodeMp3(docs)).collect()
    assert(out.length == (0L until 60L).map(i => 1 + (i % 5)).sum)
    out.foreach { r =>
      val data = (if (r.doc_id % 11 == 0) "" else s"audio body ${r.doc_id}").getBytes("UTF-8")
      var c = 0L
      var j = 0
      while (j < r.n_bytes - 4) {
        val b = if (data.isEmpty) 0 else data((r.frame_idx.toInt + j) % data.length) & 0xff
        c = (c * 31 + b) % 1000000007L
        j += 1
      }
      assert(c == r.checksum, s"doc ${r.doc_id} frame ${r.frame_idx}")
    }
    val again = Mp3.mp3Frames(Mp3.encodeMp3(docs.repartition(7))).collect()
    assert(again.map(r => (r.doc_id, r.frame_idx, r.offset, r.checksum)).sorted.toSeq ==
      out.map(r => (r.doc_id, r.frame_idx, r.offset, r.checksum)).sorted.toSeq)
  }
}
