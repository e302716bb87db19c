package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class Mp4Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def be32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("writer layout: offsets, chunking, timing resolve exactly") {
    for (id <- 0L until 12L) {
      val data = s"payload for doc $id with some length".getBytes("UTF-8")
      val idx = Mp4.parseMp4(Mp4.mp4For(id, data)).get
      val nf = 1 + (id % 5).toInt
      assert(idx.timescale == 1000)
      assert(idx.samples.length == nf)
      val base = 20 + (if (id % 3 == 0) 12 else 0) + 8 + (if (id % 2 == 0) 16 else 0)
      idx.samples.zipWithIndex.foreach { case (s, k) =>
        assert(s.size == 144)
        assert(s.chunk == k / 2, s"doc $id sample $k chunk")
        assert(s.offset == base + 288L * (k / 2) + 144L * (k % 2), s"doc $id sample $k offset")
        assert(s.dts == 100L * k)
        assert(s.dur == (if (nf > 1 && k == nf - 1) 200L else 100L))
      }
    }
  }

  test("track selection: an audio trak ahead in file order never wins") {
    // id % 2 == 0 puts a soun trak first; the parser must still index
    // the vide trak's 144-byte samples, not the 16-byte audio sample
    val idx = Mp4.parseMp4(Mp4.mp4For(4L, "x".getBytes)).get
    assert(idx.samples.forall(_.size == 144))
  }

  test("co64 and largesize forms parse like their 32-bit twins") {
    val small = Mp4.mp4For(1L, "abcdef".getBytes)
    val want = Mp4.parseMp4(small).get
    // rewrite stco -> co64 (widen each offset to 64 bits)
    def find(b: Array[Byte], tag: String): Int = {
      val t = tag.getBytes("US-ASCII")
      (0 to b.length - 4).find(i => b(i) == t(0) && b(i+1) == t(1) && b(i+2) == t(2) && b(i+3) == t(3)).get
    }
    val stcoTag = find(small, "stco")
    val stcoSize = ((small(stcoTag - 4) & 0xff) << 24) | ((small(stcoTag - 3) & 0xff) << 16) |
      ((small(stcoTag - 2) & 0xff) << 8) | (small(stcoTag - 1) & 0xff)
    val entryCount = ((small(stcoTag + 8) & 0xff) << 24) | ((small(stcoTag + 9) & 0xff) << 16) |
      ((small(stcoTag + 10) & 0xff) << 8) | (small(stcoTag + 11) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    val boxStart = stcoTag - 4
    out.write(small, 0, boxStart)
    out.write(be32(16 + 8L * entryCount)) // new size
    out.write("co64".getBytes("US-ASCII"))
    out.write(small, stcoTag + 4, 8) // ver/flags + entry_count
    var i = 0
    while (i < entryCount) {
      out.write(be32(0))
      out.write(small, stcoTag + 12 + 4 * i, 4)
      i += 1
    }
    out.write(small, boxStart + stcoSize, small.length - boxStart - stcoSize)
    // grow every enclosing box size by the 4*entryCount delta: moov/trak/mdia/minf/stbl
    val grown = out.toByteArray
    val delta = 4 * entryCount
    for (tag <- Seq("moov", "trak", "mdia", "minf", "stbl")) {
      var p = find(grown, tag) - 4
      // the video trak is the LAST trak/mdia/minf/stbl in the file
      var q = p
      var searchFrom = p + 5
      var more = true
      while (more) {
        val rest = grown.drop(searchFrom)
        val t = tag.getBytes("US-ASCII")
        val nxt = (0 to rest.length - 4).find(i => rest(i) == t(0) && rest(i+1) == t(1) && rest(i+2) == t(2) && rest(i+3) == t(3))
        nxt match { case Some(k) => q = searchFrom + k - 4; searchFrom = q + 5; case None => more = false }
      }
      val sz = ((grown(q) & 0xff) << 24) | ((grown(q+1) & 0xff) << 16) | ((grown(q+2) & 0xff) << 8) | (grown(q+3) & 0xff)
      val ns = be32(sz + delta)
      grown(q) = ns(0); grown(q+1) = ns(1); grown(q+2) = ns(2); grown(q+3) = ns(3)
    }
    val wide = Mp4.parseMp4(grown).get
    assert(wide.samples == want.samples, "co64 must resolve identically")
    // largesize form on ftyp: size=1 + 64-bit largesize
    val f = Mp4.mp4For(1L, "abcdef".getBytes)
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write(be32(1)); out2.write("ftyp".getBytes("US-ASCII"))
    out2.write(be32(0)); out2.write(be32(28)) // largesize = 28 (8 extra)
    out2.write(f, 8, 12) // original ftyp body
    out2.write(f, 20, f.length - 20)
    val shifted = Mp4.parseMp4(out2.toByteArray).get
    // chunk offsets are ABSOLUTE file positions the writer recorded, so
    // they do not move with the 8 bytes the largesize header inserted;
    // the point is the walker survives the 64-bit size form at all — a
    // misread largesize derails the box tree and returns None
    assert(shifted.samples.map(_.offset) == want.samples.map(_.offset))
    assert(shifted.samples.map(_.dts) == want.samples.map(_.dts))
  }

  test("version-1 mdhd (64-bit times) reads the timescale at the right offset") {
    val plain = Mp4.mp4For(1L, "v-one header doc".getBytes("UTF-8")) // odd id: single trak
    def find(b: Array[Byte], tag: String): Int = {
      val t = tag.getBytes("US-ASCII")
      (0 to b.length - 4).find(i => b(i) == t(0) && b(i+1) == t(1) && b(i+2) == t(2) && b(i+3) == t(3)).get
    }
    val tagAt = find(plain, "mdhd")
    val boxStart = tagAt - 4
    val oldSize = ((plain(boxStart) & 0xff) << 24) | ((plain(boxStart+1) & 0xff) << 16) |
      ((plain(boxStart+2) & 0xff) << 8) | (plain(boxStart+3) & 0xff)
    // v0 body: ver(4) c(4) m(4) ts(4) d(4) lang+pre(4); v1 widens the
    // two times and the duration to 64 bits -> body grows by 12
    val out = new java.io.ByteArrayOutputStream()
    out.write(plain, 0, boxStart)
    out.write(be32(oldSize + 12))
    out.write("mdhd".getBytes("US-ASCII"))
    out.write(be32(0x01000000)) // version 1
    (0 until 4).foreach(_ => out.write(be32(0))) // creation + modification u64s
    out.write(be32(1000)) // timescale
    out.write(be32(0)); out.write(be32(0)) // duration u64
    out.write(be32(0)) // language + pre_defined
    out.write(plain, boxStart + oldSize, plain.length - boxStart - oldSize)
    val grown = out.toByteArray
    for (tag <- Seq("moov", "trak", "mdia")) { // grow the enclosing boxes
      val p = find(grown, tag) - 4
      val sz = ((grown(p) & 0xff) << 24) | ((grown(p+1) & 0xff) << 16) | ((grown(p+2) & 0xff) << 8) | (grown(p+3) & 0xff)
      val ns = be32(sz + 12)
      grown(p) = ns(0); grown(p+1) = ns(1); grown(p+2) = ns(2); grown(p+3) = ns(3)
    }
    val idx = Mp4.parseMp4(grown).get
    assert(idx.timescale == 1000, "v1 mdhd timescale must read at body offset 20")
    assert(idx.samples == Mp4.parseMp4(plain).get.samples)
  }

  test("malformed containers drop: truncation, table inconsistencies, hostile counts") {
    val good = Mp4.mp4For(1L, "hello world hello".getBytes)
    assert(Mp4.parseMp4(good).isDefined)
    // truncations at every box-ish granularity
    for (cut <- Seq(4, 30, good.length / 2, good.length - 3))
      assert(Mp4.parseMp4(good.take(cut)).isEmpty, s"cut=$cut")
    def patch(tag: String, rel: Int, v: Array[Byte]): Array[Byte] = {
      val t = tag.getBytes("US-ASCII")
      val i = (0 to good.length - 4).find(i => good(i) == t(0) && good(i+1) == t(1) && good(i+2) == t(2) && good(i+3) == t(3)).get
      val b = good.clone()
      System.arraycopy(v, 0, b, i + rel, v.length)
      b
    }
    // stsz count inflated: stsc expansion falls short -> drop
    assert(Mp4.parseMp4(patch("stsz", 12, be32(99))).isEmpty)
    // stco entry count hostile (allocation bomb): capped and dropped
    assert(Mp4.parseMp4(patch("stco", 8, be32(0x7fffffffL))).isEmpty)
    // stts sums past the sample count -> drop
    assert(Mp4.parseMp4(patch("stts", 12, be32(1000))).isEmpty)
    // chunk offset past EOF -> drop
    assert(Mp4.parseMp4(patch("stco", 12, be32(1 << 28))).isEmpty)
    // garbage is not an mp4
    assert(Mp4.parseMp4(Array.fill(64)(0x41.toByte)).isEmpty)
    assert(Mp4.parseMp4(Array.empty).isEmpty)
  }

  test("end-to-end over the table: rows per doc, checksums match the plane model, partition-stable") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, if (i % 11 == 0) null else s"text body $i")).toDF("doc_id", "text")
    val out = Mp4.mp4SampleTable(Mp4.encodeMp4(docs)).collect()
    assert(out.length == (0L until 60L).map(i => 1 + (i % 5)).sum)
    out.foreach { s =>
      val data = (if (s.doc_id % 11 == 0) "" else s"text body ${s.doc_id}").getBytes("UTF-8")
      var c = 0L
      var j = 0
      while (j < 144) {
        val b = if (data.isEmpty) 0 else data((s.sample_idx.toInt + j) % data.length) & 0xff
        c = (c * 31 + b) % 1000000007L
        j += 1
      }
      assert(c == s.checksum, s"doc ${s.doc_id} sample ${s.sample_idx}")
    }
    val again = Mp4.mp4SampleTable(Mp4.encodeMp4(docs.repartition(7))).collect()
    assert(again.map(s => (s.doc_id, s.sample_idx, s.offset, s.checksum)).sorted.toSeq ==
      out.map(s => (s.doc_id, s.sample_idx, s.offset, s.checksum)).sorted.toSeq)
  }
}
