package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== REAL codec: LZ4 block format, from scratch ========
  *
  * The codec Spark itself uses for shuffle and broadcast compression —
  * token-based LZ77 with nibble-packed lengths, built from the published
  * block specification:
  *
  *  - each sequence: a token whose HIGH nibble is the literal length and
  *    LOW nibble the match length minus 4, both extended past 15 by
  *    255-valued continuation bytes; literals; a 2-byte little-endian
  *    offset (1..65535); match-length extension bytes;
  *  - the block's END-OF-STREAM rules, the part naive encoders violate:
  *    the final sequence is literals-only (no offset), the last 5 bytes
  *    of output are always literals, and a match may not start within
  *    the last 12 bytes — the encoder enforces both margins, the decoder
  *    accepts exactly the spec's shape;
  *  - overlapping matches replay byte-at-a-time (offset < length is the
  *    RLE idiom, same as DEFLATE and Snappy).
  *
  * Raw LZ4 blocks carry NO length preamble — the caller supplies the
  * exact decompressed size (the lz4-java fast-decompressor contract),
  * and decode must land exactly on it with the input fully consumed.
  * LzSpec cross-verifies BOTH directions against the production
  * `net.jpountz.lz4` library on every payload shape. Oracled via the
  * same round-trip contract as `deflate_roundtrip`/`snappy_roundtrip`.
  * Map-only, no shuffle.
  *
  * On top of the block codec sits the '''LZ4 FRAME format''' (the
  * wrapper `.lz4` files and Arrow IPC `BodyCompression` carry):
  * xxHash32 from its published spec, the descriptor with its header
  * checksum, independent data blocks with the stored-block rule, the
  * EndMark, and the optional block/content checksums — both
  * directions, cross-verified against commons-compress's FramedLZ4 in
  * LzSpec and consumed by [[Arrow]]'s compressed-body decode.
  */
object Lz4 {

  private final class MalformedLz4 extends RuntimeException("malformed lz4", null, false, false)

  private def writeLen(out: java.io.ByteArrayOutputStream, lenIn: Int): Unit = {
    var len = lenIn // the amount past 15 encoded as 255-run + remainder
    while (len >= 255) { out.write(255); len -= 255 }
    out.write(len)
  }

  /** Hash-table LZ77 with the block format's end margins enforced. */
  private[ext] def compress(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val out = new java.io.ByteArrayOutputStream(n / 2 + 16)
    def emit(litFrom: Int, litLen: Int, matchLen: Int, offset: Int): Unit = {
      val litNib = math.min(litLen, 15)
      val matNib = if (matchLen == 0) 0 else math.min(matchLen - 4, 15)
      out.write((litNib << 4) | matNib)
      if (litNib == 15) writeLen(out, litLen - 15)
      out.write(data, litFrom, litLen)
      if (matchLen > 0) {
        out.write(offset & 0xff)
        out.write((offset >> 8) & 0xff)
        if (matNib == 15) writeLen(out, matchLen - 4 - 15)
      }
    }
    // matches must end >= 5 bytes before the end and not start in the
    // last 12 (the spec's end-of-stream margins)
    val matchLimit = n - 5
    val mfLimit = n - 12
    if (n >= 13) {
      val HashBits = 14
      val table = new Array[Int](1 << HashBits)
      java.util.Arrays.fill(table, -1)
      def hash4(i: Int): Int = {
        val v = ((data(i) & 0xff) << 24) | ((data(i + 1) & 0xff) << 16) |
          ((data(i + 2) & 0xff) << 8) | (data(i + 3) & 0xff)
        (v * 0x1e35a7bd) >>> (32 - HashBits)
      }
      var litStart = 0
      var i = 0
      while (i < mfLimit) {
        val h = hash4(i)
        val cand = table(h)
        table(h) = i
        if (cand >= 0 && i - cand <= 65535 &&
          data(cand) == data(i) && data(cand + 1) == data(i + 1) &&
          data(cand + 2) == data(i + 2) && data(cand + 3) == data(i + 3)) {
          var l = 4
          while (i + l < matchLimit && data(cand + l) == data(i + l)) l += 1
          emit(litStart, i - litStart, l, i - cand)
          i += l
          litStart = i
        } else i += 1
      }
      emit(litStart, n - litStart, 0, 0) // final literals-only sequence
    } else {
      emit(0, n, 0, 0)
    }
    out.toByteArray
  }

  /** Strict decode to an EXACT expected size (raw blocks carry no length
    * preamble); bounds-checked throughout, input fully consumed.
    */
  private[ext] def decompress(bytes: Array[Byte], outLen: Int): Array[Byte] = {
    if (bytes == null || outLen < 0) throw new MalformedLz4
    val out = new Array[Byte](outLen)
    var o = 0
    var p = 0
    val n = bytes.length
    def readLen(base: Int): Int = {
      var len = base
      if (base == 15) {
        var b = 255
        while (b == 255) {
          if (p >= n) throw new MalformedLz4
          b = bytes(p) & 0xff
          p += 1
          len += b
          if (len < 0) throw new MalformedLz4 // overflow
        }
      }
      len
    }
    if (n == 0) { if (outLen != 0) throw new MalformedLz4 else return out }
    var done = false
    while (!done) {
      if (p >= n) throw new MalformedLz4
      val token = bytes(p) & 0xff
      p += 1
      val litLen = readLen(token >> 4)
      if (p + litLen > n || o + litLen > outLen) throw new MalformedLz4
      System.arraycopy(bytes, p, out, o, litLen)
      p += litLen; o += litLen
      if (p == n) {
        // the final sequence is literals-only — this is the only legal end
        done = true
      } else {
        if (p + 2 > n) throw new MalformedLz4
        val offset = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2
        if (offset <= 0 || offset > o) throw new MalformedLz4
        val matchLen = readLen(token & 0xf) + 4
        if (matchLen < 4 || o + matchLen > outLen) throw new MalformedLz4 // < 4 means the +4 overflowed Int
        var k = 0
        while (k < matchLen) { out(o) = out(o - offset); o += 1; k += 1 }
      }
    }
    if (o != outLen) throw new MalformedLz4
    out
  }

  /** Growable output sink for frame-block decoding: blocks append, and
    * LINKED blocks (B.Indep = 0) may back-reference into earlier
    * blocks' output — `windowStart` bounds how far a match may reach.
    */
  private final class FrameSink(maxOut: Int) {
    var buf = new Array[Byte](math.min(256, math.max(maxOut, 1)))
    var len = 0
    def grow(need: Int): Unit =
      if (len + need > buf.length) {
        if (len + need > maxOut) throw new MalformedLz4
        buf = java.util.Arrays.copyOf(buf, math.min(math.max(buf.length * 2, len + need), maxOut))
      }
  }

  /** Decode one frame block from `bytes[from, until)` into `sink`,
    * allowing matches back to `windowStart` (the block's own start for
    * independent frames, the frame start for linked ones).
    */
  private def decompressInto(bytes: Array[Byte], from: Int, until: Int,
      sink: FrameSink, windowStart: Int): Unit = {
    var p = from
    def readLen(base: Int): Int = {
      var len = base
      if (base == 15) {
        var b = 255
        while (b == 255) {
          if (p >= until) throw new MalformedLz4
          b = bytes(p) & 0xff
          p += 1
          len += b
          if (len < 0) throw new MalformedLz4
        }
      }
      len
    }
    if (from == until) return
    var done = false
    while (!done) {
      if (p >= until) throw new MalformedLz4
      val token = bytes(p) & 0xff
      p += 1
      val litLen = readLen(token >> 4)
      if (p + litLen > until) throw new MalformedLz4
      sink.grow(litLen)
      System.arraycopy(bytes, p, sink.buf, sink.len, litLen)
      p += litLen; sink.len += litLen
      if (p == until) done = true
      else {
        if (p + 2 > until) throw new MalformedLz4
        val offset = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2
        if (offset <= 0 || offset > sink.len - windowStart || offset > 65536)
          throw new MalformedLz4
        val matchLen = readLen(token & 0xf) + 4
        if (matchLen < 4) throw new MalformedLz4
        sink.grow(matchLen)
        var k = 0
        while (k < matchLen) { sink.buf(sink.len) = sink.buf(sink.len - offset); sink.len += 1; k += 1 }
      }
    }
  }

  // ======== xxHash32 (from the published xxHash specification) ========
  // The frame format's integrity algorithm: header checksum, optional
  // per-block checksums, optional content checksum.

  private val XP1 = 0x9E3779B1
  private val XP2 = 0x85EBCA77
  private val XP3 = 0xC2B2AE3D
  private val XP4 = 0x27D4EB2F
  private val XP5 = 0x165667B1

  private[ext] def xxh32(b: Array[Byte], from: Int, until: Int, seed: Int): Int = {
    def u32(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    val len = until - from
    var p = from
    var h =
      if (len >= 16) {
        var a1 = seed + XP1 + XP2
        var a2 = seed + XP2
        var a3 = seed
        var a4 = seed - XP1
        while (p + 16 <= until) {
          a1 = Integer.rotateLeft(a1 + u32(p) * XP2, 13) * XP1
          a2 = Integer.rotateLeft(a2 + u32(p + 4) * XP2, 13) * XP1
          a3 = Integer.rotateLeft(a3 + u32(p + 8) * XP2, 13) * XP1
          a4 = Integer.rotateLeft(a4 + u32(p + 12) * XP2, 13) * XP1
          p += 16
        }
        Integer.rotateLeft(a1, 1) + Integer.rotateLeft(a2, 7) +
          Integer.rotateLeft(a3, 12) + Integer.rotateLeft(a4, 18)
      } else seed + XP5
    h += len
    while (p + 4 <= until) { h = Integer.rotateLeft(h + u32(p) * XP3, 17) * XP4; p += 4 }
    while (p < until) { h = Integer.rotateLeft(h + (b(p) & 0xff) * XP5, 11) * XP1; p += 1 }
    h ^= h >>> 15; h *= XP2; h ^= h >>> 13; h *= XP3; h ^= h >>> 16
    h
  }

  // ======== LZ4 FRAME format (the interchange wrapper) ========
  // What .lz4 files and Arrow IPC BodyCompression actually carry: magic,
  // a descriptor (version 01, flag bits, block-max-size code) protected
  // by an xxh32 header checksum, data blocks (high bit = stored; LINKED
  // blocks back-reference earlier blocks when B.Indep is clear), EndMark,
  // optional block/content checksums and content size. Cross-verified
  // against commons-compress's FramedLZ4 streams in Lz4Spec.

  private val FrameMagic = 0x184D2204

  /** One frame over `data`: version 01, independent 64 KiB blocks,
    * content checksum. Each block takes the compressed form only when it
    * actually saves bytes (the spec's stored-block rule).
    */
  private[ext] def frameCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >>> 24) & 0xff) }
    le32(FrameMagic)
    val flg = 0x40 | 0x20 | 0x04 // version 01, B.Indep, C.Checksum
    val bd = 0x40 // block max size code 4 = 64 KiB
    out.write(flg); out.write(bd)
    out.write((xxh32(Array(flg.toByte, bd.toByte), 0, 2, 0) >>> 8) & 0xff) // HC
    val blockMax = 64 * 1024
    var p = 0
    while (p < data.length) {
      val take = math.min(blockMax, data.length - p)
      val chunk = java.util.Arrays.copyOfRange(data, p, p + take)
      val comp = compress(chunk)
      if (comp.length < take) { le32(comp.length); out.write(comp, 0, comp.length) }
      else { le32(take | 0x80000000); out.write(chunk, 0, take) }
      p += take
    }
    le32(0) // EndMark
    le32(xxh32(data, 0, data.length, 0)) // content checksum
    out.toByteArray
  }

  /** Decode one frame from `bytes[from, until)`; output capped at
    * `maxOut`. Verifies the header checksum, per-block checksums when
    * flagged, the content checksum when flagged, and the declared
    * content size when present; the frame must consume the range
    * exactly. Linked-dictionary frames (DictID) are out of scope.
    */
  private[ext] def frameDecompress(bytes: Array[Byte], from: Int, until: Int,
      maxOut: Int): Array[Byte] = {
    var p = from
    def u32(): Int = {
      if (p + 4 > until) throw new MalformedLz4
      val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
        ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
      p += 4
      v
    }
    if (u32() != FrameMagic) throw new MalformedLz4
    val descStart = p
    if (p + 2 > until) throw new MalformedLz4
    val flg = bytes(p) & 0xff; p += 1
    val bd = bytes(p) & 0xff; p += 1
    if ((flg >>> 6) != 1) throw new MalformedLz4 // version must be 01
    if ((flg & 0x02) != 0) throw new MalformedLz4 // reserved bit
    if ((flg & 0x01) != 0) throw new MalformedLz4 // DictID: out of scope
    val blockIndep = (flg & 0x20) != 0
    val blockChecksum = (flg & 0x10) != 0
    val hasContentSize = (flg & 0x08) != 0
    val contentChecksum = (flg & 0x04) != 0
    if ((bd & 0x8f) != 0) throw new MalformedLz4 // reserved BD bits
    val bmCode = (bd >>> 4) & 0x07
    if (bmCode < 4 || bmCode > 7) throw new MalformedLz4
    val blockMax = 1 << (2 * bmCode + 8) // 4→64K, 5→256K, 6→1M, 7→4M
    var declaredSize = -1L
    if (hasContentSize) {
      if (p + 8 > until) throw new MalformedLz4
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (bytes(p + i) & 0xffL); i -= 1 }
      p += 8
      declaredSize = v
      if (declaredSize < 0 || declaredSize > maxOut) throw new MalformedLz4
    }
    if (p >= until) throw new MalformedLz4
    val hc = bytes(p) & 0xff; p += 1
    if (((xxh32(bytes, descStart, p - 1, 0) >>> 8) & 0xff) != hc) throw new MalformedLz4
    val sink = new FrameSink(maxOut)
    var done = false
    while (!done) {
      val word = u32()
      if (word == 0) done = true
      else {
        val stored = (word & 0x80000000) != 0
        val len = word & 0x7fffffff
        if (len <= 0 || len > blockMax || p + len > until) throw new MalformedLz4
        if (blockChecksum) {
          val bc = { val save = p; p += len; val c = u32(); p = save; c }
          if (xxh32(bytes, p, p + len, 0) != bc) throw new MalformedLz4
        }
        if (stored) {
          sink.grow(len)
          System.arraycopy(bytes, p, sink.buf, sink.len, len)
          sink.len += len
        } else {
          // LINKED blocks (B.Indep = 0) may back-reference earlier blocks
          val windowStart = if (blockIndep) sink.len else 0
          decompressInto(bytes, p, p + len, sink, windowStart)
        }
        p += len
        if (blockChecksum) p += 4
      }
    }
    val data = java.util.Arrays.copyOf(sink.buf, sink.len)
    if (contentChecksum) {
      val cc = u32()
      if (xxh32(data, 0, data.length, 0) != cc) throw new MalformedLz4
    }
    if (declaredSize >= 0 && data.length.toLong != declaredSize) throw new MalformedLz4
    if (p != until) throw new MalformedLz4 // the frame must consume the range exactly
    data
  }

  final case class Lz4Stats(
      doc_id: Long, n_bytes: Long, lz4_len: Long, ratio: Double, checksum: Long)

  /** Compress-then-decode round trip per document — the third member of
    * the compression-signal family (`deflate`, `snappy`, `lz4`), same
    * oracle shape: decoded length + checksum replayed from the source
    * text, emission-model values pinned by the lz4-java cross
    * differential in Lz4Spec.
    */
  def lz4Signal(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Dataset[Lz4Stats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0 && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val data = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val comp = compress(data)
        val ratio = comp.length.toDouble / math.max(1, data.length)
        try {
          val back = decompress(comp, data.length)
          var c = 0L
          back.foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
          Lz4Stats(id, back.length.toLong, comp.length.toLong, ratio, c)
        } catch {
          case scala.util.control.NonFatal(_) =>
            Lz4Stats(id, -1L, comp.length.toLong, ratio, -1L)
        }
      }
  }
}
