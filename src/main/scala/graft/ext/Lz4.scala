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
