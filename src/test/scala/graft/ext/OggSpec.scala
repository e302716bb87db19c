package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class OggSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("the Ogg CRC flavor: MSB-first 0x04C11DB7, init 0, no final xor") {
    // known property: CRC of a single zero byte is 0 under this flavor
    assert(Ogg.oggCrc(Array[Byte](0), 0, 1) == 0)
    // and differs from the reflected zip CRC on the same input
    val data = "ogg crc vector".getBytes("UTF-8")
    val zip = new java.util.zip.CRC32()
    zip.update(data)
    assert(Ogg.oggCrc(data, 0, data.length) != zip.getValue.toInt)
    // linearity sanity: prefix-extension changes the value
    assert(Ogg.oggCrc(data, 0, data.length) != Ogg.oggCrc(data, 0, data.length - 1))
  }

  test("page walk: offsets, granules, lacing, flags resolve exactly for every arm") {
    for (id <- 0L until 12L) {
      val data = s"ogg audio doc $id payload".getBytes("UTF-8")
      val pages = Ogg.parseOgg(Ogg.oggFor(id, data)).get
      val nf = 1 + (id % 5).toInt
      assert(pages.length == nf, s"doc $id")
      var off = 0L
      pages.zipWithIndex.foreach { case (pg, k) =>
        val size = Ogg.pagePayloadSize(id, k)
        assert(pg.offset == off, s"doc $id page $k offset")
        assert(pg.payloadUntil - pg.payloadFrom == size)
        assert(pg.granule == 1152L * (k + 1))
        assert(pg.serial == id && pg.seq == k)
        assert(pg.nPackets == 1)
        off += 27 + (size / 255 + 1) + size
      }
    }
  }

  test("malformed streams drop: CRC, sequence gap, missing BOS/EOS, truncation, trailing bytes") {
    val good = Ogg.oggFor(4L, "hello ogg stream".getBytes("UTF-8")) // 5 pages
    assert(Ogg.parseOgg(good).isDefined)
    def bad(mut: Array[Byte] => Unit): Array[Byte] = { val b = good.clone(); mut(b); b }
    // flip a payload byte: the page CRC must catch it
    assert(Ogg.parseOgg(bad(_(40) = 0x7e)).isEmpty, "payload flip vs page CRC")
    // flip a sequence number byte (and note the CRC will also fail first
    // if we don't fix it — flip INSIDE the crc-covered region is enough)
    assert(Ogg.parseOgg(bad(_(18) = 0x09)).isEmpty, "sequence bytes are CRC-covered")
    // strip the BOS flag from page 0 (re-CRC so only the flag rule fires)
    val noBos = good.clone()
    noBos(5) = (noBos(5) & ~2).toByte
    locally {
      val segs = noBos(26) & 0xff
      var size = 0
      (0 until segs).foreach(j => size += noBos(27 + j) & 0xff)
      val end = 27 + segs + size
      val crc = Ogg.oggCrc(noBos, 0, end, zeroAt = 22)
      noBos(22) = (crc & 0xff).toByte; noBos(23) = ((crc >>> 8) & 0xff).toByte
      noBos(24) = ((crc >>> 16) & 0xff).toByte; noBos(25) = ((crc >>> 24) & 0xff).toByte
    }
    assert(Ogg.parseOgg(noBos).isEmpty, "first page must be BOS")
    // truncation mid-payload and mid-header
    assert(Ogg.parseOgg(good.take(good.length - 5)).isEmpty)
    assert(Ogg.parseOgg(good.take(10)).isEmpty)
    // trailing garbage after the EOS page
    assert(Ogg.parseOgg(good ++ Array[Byte]('O', 'g', 'g', 'S')).isEmpty)
    assert(Ogg.parseOgg(Array.empty).isEmpty)
    // a stream that never ends (strip EOS from the last page, re-CRC)
    val noEos = good.clone()
    val lastOff = {
      var off = 0
      var k = 0
      while (k < 4) { val s = Ogg.pagePayloadSize(4L, k); off += 27 + (s / 255 + 1) + s; k += 1 }
      off
    }
    noEos(lastOff + 5) = (noEos(lastOff + 5) & ~4).toByte
    locally {
      val segs = noEos(lastOff + 26) & 0xff
      var size = 0
      (0 until segs).foreach(j => size += noEos(lastOff + 27 + j) & 0xff)
      val end = lastOff + 27 + segs + size
      val crc = Ogg.oggCrc(noEos, lastOff, end, zeroAt = lastOff + 22)
      noEos(lastOff + 22) = (crc & 0xff).toByte; noEos(lastOff + 23) = ((crc >>> 8) & 0xff).toByte
      noEos(lastOff + 24) = ((crc >>> 16) & 0xff).toByte; noEos(lastOff + 25) = ((crc >>> 24) & 0xff).toByte
    }
    assert(Ogg.parseOgg(noEos).isEmpty, "a stream with no EOS page is malformed")
  }

  test("end-to-end over the table: checksums match the plane model; partition-stable") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, if (i % 11 == 0) null else s"ogg body $i")).toDF("doc_id", "text")
    val out = Ogg.oggPages(Ogg.encodeOgg(docs)).collect()
    assert(out.length == (0L until 60L).map(i => 1 + (i % 5)).sum)
    out.foreach { r =>
      val data = (if (r.doc_id % 11 == 0) "" else s"ogg body ${r.doc_id}").getBytes("UTF-8")
      var c = 0L
      var j = 0
      while (j < r.n_bytes) {
        val b = if (data.isEmpty) 0 else data((r.page_idx.toInt + j) % data.length) & 0xff
        c = (c * 31 + b) % 1000000007L
        j += 1
      }
      assert(c == r.checksum, s"doc ${r.doc_id} page ${r.page_idx}")
    }
    val again = Ogg.oggPages(Ogg.encodeOgg(docs.repartition(7))).collect()
    assert(again.map(r => (r.doc_id, r.page_idx, r.offset, r.checksum)).sorted.toSeq ==
      out.map(r => (r.doc_id, r.page_idx, r.offset, r.checksum)).sorted.toSeq)
  }

  test("codec identification headers: fields + granule clocks per codec") {
    for (id <- 0L until 32L) {
      val row = Ogg.parseStreamInfo(id, Ogg.oggStreamFor(id)).getOrElse(fail(s"doc $id dropped"))
      val nf = Ogg.streamPages(id)
      assert(row.serial == (id & 0xffffffffL))
      assert(row.channels == Ogg.streamChannels(id), s"doc $id channels")
      assert(row.sample_rate == Ogg.headerRate(id), s"doc $id rate")
      if (id % 2 == 1) {
        assert(row.codec == "opus" && row.pre_skip == Ogg.opusPreSkip(id))
        // Opus granules tick at 48 kHz regardless of the input rate
        assert(row.duration_us == (960L * nf - Ogg.opusPreSkip(id)) * 1000000L / 48000L)
      } else {
        assert(row.codec == "vorbis" && row.pre_skip == 0L)
        assert(row.duration_us == 1024L * nf * 1000000L / Ogg.headerRate(id))
      }
    }
  }

  test("codec header damage quarantines: magic, version, framing, channels, family") {
    def mutate(id: Long)(f: Array[Byte] => Unit): Option[Ogg.OggStreamRow] = {
      val b = Ogg.oggStreamFor(id)
      f(b)
      // recompute the BOS page CRC so ONLY the header-field damage is
      // under test, not the page-integrity layer
      val nSegs = b(26) & 0xff
      var size = 0
      var j = 0
      while (j < nSegs) { size += b(27 + j) & 0xff; j += 1 }
      val end = 27 + nSegs + size
      b(22) = 0; b(23) = 0; b(24) = 0; b(25) = 0
      val crc = Ogg.oggCrc(b, 0, end)
      b(22) = (crc & 0xff).toByte; b(23) = ((crc >>> 8) & 0xff).toByte
      b(24) = ((crc >>> 16) & 0xff).toByte; b(25) = ((crc >>> 24) & 0xff).toByte
      Ogg.parseStreamInfo(id, b)
    }
    val vor = 2L // vorbis doc; BOS payload starts at 27 + 1 lacing byte = 28
    val pay = 28
    assert(mutate(vor)(b => b(pay + 1) = 'x').isEmpty) // "vorbis" magic broken
    assert(mutate(vor)(b => b(pay + 7) = 9).isEmpty) // version != 0
    assert(mutate(vor)(b => b(pay + 11) = 0).isEmpty) // zero channels
    assert(mutate(vor)(b => b(pay + 28) = 0x8b.toByte).isEmpty) // blocksize_0 > blocksize_1
    assert(mutate(vor)(b => b(pay + 29) = 0).isEmpty) // framing bit clear
    val opu = 1L
    assert(mutate(opu)(b => b(pay) = 'Q').isEmpty) // OpusHead magic broken
    assert(mutate(opu)(b => b(pay + 8) = 2).isEmpty) // version != 1
    assert(mutate(opu)(b => b(pay + 9) = 3).isEmpty) // family 0 with 3 channels
    assert(mutate(opu)(b => b(pay + 18) = 5).isEmpty) // unknown mapping family
    // pre-skip past the final granule quarantines (duration would be negative)
    assert(mutate(opu) { b =>
      b(pay + 10) = 0xff.toByte; b(pay + 11) = 0x7f.toByte
    }.isEmpty)
    // a stream whose BOS packet is neither codec quarantines
    assert(mutate(vor)(b => b(pay) = 9).isEmpty)
  }

  test("ogg_streams operator: per-doc metadata rows, damage drops whole") {
    import spark.implicits._
    val docs = (0L until 16L).toDF("doc_id")
    val rows = Ogg.oggStreams(Ogg.encodeOggStreams(docs)).collect()
    assert(rows.length == 16)
    assert(rows.count(_.codec == "opus") == 8 && rows.count(_.codec == "vorbis") == 8)
    val mixed = Ogg.encodeOggStreams(docs.filter($"doc_id" < 2)).as[(Long, Array[Byte])]
      .map { case (id, p) => if (id == 0L) (id, p.take(30)) else (id, p) }
      .toDF("doc_id", "payload")
    assert(Ogg.oggStreams(mixed).collect().map(_.doc_id).toSeq == Seq(1L))
  }
}
