package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== OGG page demux (RFC 3533) ========
  *
  * The free-codec audio container (Vorbis/Opus ship in it) next to
  * [[Mp3]]'s frame walk and [[Mp4]]'s sample tables: an Ogg stream is a
  * sequence of self-delimiting PAGES, each carrying a 27-byte header —
  * `OggS` capture pattern, version 0, a header-type bitfield
  * (continuation / BOS / EOS), the 64-bit granule position, the stream
  * serial, a sequence number, a CRC, and a segment table (lacing
  * values: 255 = packet continues, < 255 ends a packet) — followed by
  * the segment payload.
  *
  * Two properties make the walk strict where MP3's cannot be:
  *
  *  - **A real integrity check**: the page CRC is a 32-bit MSB-first
  *    CRC with polynomial 0x04C11DB7, init 0, no final xor, computed
  *    with the CRC field zeroed — a FOURTH checksum flavor in house
  *    (next to the reflected zip CRC-32, the Castagnoli CRC-32C, and
  *    CRC-64-ECMA), implemented from scratch and verified per page.
  *  - **Sequencing**: page sequence numbers must increase by exactly
  *    one within a stream, the first page must carry BOS, the last
  *    EOS, and pages must tile the file exactly — a dropped or
  *    reordered page cannot pass.
  *
  * Per page the real offset, granule position, packet count (ended
  * lacing runs), and a rolling checksum of the payload are emitted.
  * Malformed documents drop whole; map-only per payload.
  *
  * No reference citation — north-star scope completing the audio
  * container pair.
  */
object Ogg {

  // ------------------------------------------------ the Ogg CRC flavor

  private val crcTable: Array[Int] = locally {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private[ext] def oggCrc(b: Array[Byte], from: Int, until: Int, zeroAt: Int = -1): Int = {
    var c = 0
    var i = from
    while (i < until) {
      val byte = if (zeroAt >= 0 && i >= zeroAt && i < zeroAt + 4) 0 else b(i) & 0xff
      c = (c << 8) ^ crcTable(((c >>> 24) ^ byte) & 0xff)
      i += 1
    }
    c
  }

  // ------------------------------------------------------------- writer

  private def utf8Bytes(s: String): Array[Byte] =
    if (s == null) Array.empty else s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private[ext] def pagePayloadSize(id: Long, k: Int): Int =
    200 + 77 * ((id + k) % 7).toInt // crosses the 255 lacing boundary both ways

  /** Per doc: `1 + id % 5` pages of one packet each (lacing 255-runs +
    * terminator), granule accumulating 1152 ticks per page, BOS on the
    * first page and EOS on the last, serial = doc id, real CRCs.
    */
  private[ext] def oggFor(id: Long, data: Array[Byte]): Array[Byte] = {
    val nf = (1 + java.lang.Math.floorMod(id, 5L)).toInt
    val out = new java.io.ByteArrayOutputStream()
    var k = 0
    while (k < nf) {
      val size = pagePayloadSize(id, k)
      val nFull = size / 255
      val rest = size % 255
      val segs = Array.fill(nFull)(255) :+ rest // rest < 255 ends the packet
      val header = new java.io.ByteArrayOutputStream()
      header.write('O'); header.write('g'); header.write('g'); header.write('S')
      header.write(0) // version
      header.write((if (k == 0) 2 else 0) | (if (k == nf - 1) 4 else 0)) // BOS/EOS
      val granule = 1152L * (k + 1)
      var j = 0
      while (j < 8) { header.write(((granule >>> (8 * j)) & 0xff).toInt); j += 1 }
      j = 0
      while (j < 4) { header.write(((id >>> (8 * j)) & 0xff).toInt); j += 1 } // serial
      j = 0
      while (j < 4) { header.write(((k >>> (8 * j)) & 0xff).toInt); j += 1 } // sequence
      val crcPos = header.size()
      header.write(0); header.write(0); header.write(0); header.write(0) // CRC slot
      header.write(segs.length)
      segs.foreach(header.write)
      val page = new java.io.ByteArrayOutputStream()
      header.writeTo(page)
      var p = 0
      while (p < size) {
        page.write(if (data.length == 0) 0 else data((k + p) % data.length) & 0xff)
        p += 1
      }
      val bytes = page.toByteArray
      val crc = oggCrc(bytes, 0, bytes.length)
      bytes(crcPos) = (crc & 0xff).toByte
      bytes(crcPos + 1) = ((crc >>> 8) & 0xff).toByte
      bytes(crcPos + 2) = ((crc >>> 16) & 0xff).toByte
      bytes(crcPos + 3) = ((crc >>> 24) & 0xff).toByte
      out.write(bytes, 0, bytes.length)
      k += 1
    }
    out.toByteArray
  }

  def encodeOgg(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol).cast("long") >= 0)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, textOrNull) => (id, oggFor(id, utf8Bytes(textOrNull))) }
      .toDF(idCol, "payload")
      .select(
        col(idCol), col("payload"),
        struct(
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("audio/ogg").as("mime")).as("meta"))
  }

  // ------------------------------------------------------------- parser

  private final class MalformedOgg
      extends RuntimeException("malformed ogg", null, false, false)
  private def fail(): Nothing = throw new MalformedOgg

  final case class OggPage(offset: Long, granule: Long, serial: Long,
      seq: Long, nPackets: Int, payloadFrom: Int, payloadUntil: Int)

  private[ext] def parseOgg(bytes: Array[Byte], maxPages: Int = 1 << 20): Option[Seq[OggPage]] = {
    try Some(parseStrict(bytes, maxPages))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def parseStrict(bytes: Array[Byte], maxPages: Int): Seq[OggPage] = {
    val n = bytes.length
    var p = 0
    val pages = Seq.newBuilder[OggPage]
    var count = 0
    var expectSeq = -1L
    var sawEos = false
    def u32(pos: Int): Long =
      (bytes(pos) & 0xffL) | ((bytes(pos + 1) & 0xffL) << 8) |
        ((bytes(pos + 2) & 0xffL) << 16) | ((bytes(pos + 3) & 0xffL) << 24)
    while (p < n) {
      if (count >= maxPages) fail()
      if (sawEos) fail() // pages after the EOS page
      if (p + 27 > n) fail()
      if (bytes(p) != 'O' || bytes(p + 1) != 'g' || bytes(p + 2) != 'g' || bytes(p + 3) != 'S') fail()
      if (bytes(p + 4) != 0) fail() // version
      val htype = bytes(p + 5) & 0xff
      var granule = 0L
      var j = 0
      while (j < 8) { granule |= (bytes(p + 6 + j) & 0xffL) << (8 * j); j += 1 }
      val serial = u32(p + 14)
      val seq = u32(p + 18)
      val crc = u32(p + 22).toInt
      val nSegs = bytes(p + 26) & 0xff
      if (p + 27 + nSegs > n) fail()
      var size = 0
      var nPackets = 0
      j = 0
      while (j < nSegs) {
        val lace = bytes(p + 27 + j) & 0xff
        size += lace
        if (lace < 255) nPackets += 1
        j += 1
      }
      val pageEnd = p + 27 + nSegs + size
      if (pageEnd > n) fail() // truncated payload
      if (oggCrc(bytes, p, pageEnd, zeroAt = p + 22) != crc) fail() // page CRC
      if (count == 0) {
        if ((htype & 2) == 0) fail() // first page must be BOS
        expectSeq = seq
      } else {
        if ((htype & 2) != 0) fail() // BOS past the first page
        if (seq != expectSeq) fail() // dropped or reordered page
      }
      expectSeq += 1
      if ((htype & 4) != 0) sawEos = true
      pages += OggPage(p.toLong, granule, serial, seq, nPackets, p + 27 + nSegs, pageEnd)
      p = pageEnd
      count += 1
    }
    if (count == 0 || !sawEos) fail() // empty, or the stream never ended
    pages.result()
  }

  final case class OggPageRow(doc_id: Long, page_idx: Long, offset: Long,
      granule: Long, n_packets: Long, n_bytes: Long, checksum: Long)

  /** The operator: payloads → the page index with payload checksums;
    * malformed documents drop whole.
    */
  def oggPages(withBinary: DataFrame, idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[OggPageRow] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty)
        parseOgg(bytes).toSeq.flatMap { pages =>
          pages.zipWithIndex.map { case (pg, k) =>
            var c = 0L
            var j = pg.payloadFrom
            while (j < pg.payloadUntil) { c = (c * 31 + (bytes(j) & 0xff)) % 1000000007L; j += 1 }
            OggPageRow(id, k.toLong, pg.offset, pg.granule, pg.nPackets.toLong,
              (pg.payloadUntil - pg.payloadFrom).toLong, c)
          }
        }
      }
  }
}
