package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== MP3 frame indexing (MPEG-1 Layer III) ========
  *
  * The audio shelf's dominant container: crawled audio is
  * overwhelmingly MP3, and indexing it — like [[Mp4]] for video —
  * needs no decoder, just the frame headers: every frame is
  * self-describing (4-byte big-endian header: 11-bit sync, version,
  * layer, bitrate index, sample-rate index, padding bit), and its byte
  * length follows as `144·bitrate/sampleRate + padding` for MPEG-1
  * Layer III. The walk:
  *
  *  - an ID3v2 tag at the start is skipped via its syncsafe length
  *    (7 bits per byte — the format's deliberate anti-false-sync
  *    encoding), an ID3v1 `TAG` trailer (fixed 128 bytes) at the end;
  *  - each frame's sync and field validity is checked (free-format
  *    bitrate 0 and index 15, reserved sample-rate 3, and non-MPEG1 /
  *    non-Layer-III frames are out of subset and malformed — a real
  *    corpus validator flags them, it does not guess);
  *  - protection bit 0 (CRC-16 present) is accepted and the two CRC
  *    bytes counted into the frame per the spec, but the CRC itself is
  *    not verified (it covers the side-info bits a decoder holds; an
  *    INDEXER treats it as payload);
  *  - frames must tile the region between the tags EXACTLY — trailing
  *    garbage or a truncated last frame is malformed, and damage drops
  *    the whole document (the multimodal family's convention).
  *
  * Per frame the real byte offset, length, bitrate, sample rate, and a
  * rolling checksum of the frame PAYLOAD (after the header) are
  * emitted — the alignment/integrity table an audio-curation pass
  * thresholds on. Map-only per payload, zero shuffles.
  *
  * No reference citation — north-star scope next to the WAV/μ-law and
  * AVI/MP4 codecs.
  */
object Mp3 {

  private val BitrateKbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  private val SampleRate = Array(44100, 48000, 32000, -1)

  // ------------------------------------------------------------- writer

  private def utf8Bytes(s: String): Array[Byte] =
    if (s == null) Array.empty else s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private[ext] def frameSpec(id: Long, k: Int): (Int, Int, Int) = {
    // (bitrateIdx, sampleRateIdx, padding): every arm cycles
    val bi = 9 + ((id + k) % 5).toInt // 128..320 kbps
    val si = ((id + k) % 3).toInt // all three valid rates
    val pad = ((id + k) % 2).toInt
    (bi, si, pad)
  }

  private[ext] def frameSize(bi: Int, si: Int, pad: Int): Int =
    144 * BitrateKbps(bi) * 1000 / SampleRate(si) + pad

  /** Per doc: optional ID3v2 tag (every 2nd doc, 20-byte body with the
    * syncsafe length), `1 + id % 5` frames whose payload is the doc's
    * UTF-8 bytes cycled from offset k (the shared plane model), an
    * optional ID3v1 trailer (every 4th doc ≡ 1).
    */
  private[ext] def mp3For(id: Long, data: Array[Byte]): Array[Byte] = {
    val nf = (1 + java.lang.Math.floorMod(id, 5L)).toInt
    val out = new java.io.ByteArrayOutputStream()
    if (id % 2 == 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0) // version 2.3.0
      out.write(0) // flags
      // syncsafe 32-bit body length = 20
      out.write(0); out.write(0); out.write(0); out.write(20)
      (0 until 20).foreach(_ => out.write(0))
    }
    var k = 0
    while (k < nf) {
      val (bi, si, pad) = frameSpec(id, k)
      val size = frameSize(bi, si, pad)
      // header: sync(11) ver(2)=11 layer(2)=01 prot(1)=1 -> FF FB for 44.1
      val b1 = 0xff
      val b2 = 0xe0 | (3 << 3) | (1 << 1) | 1 // sync low, MPEG1, Layer III, no CRC
      val b3 = (bi << 4) | (si << 2) | (pad << 1)
      val b4 = 0x44 // joint stereo, no flags, no emphasis
      out.write(b1); out.write(b2); out.write(b3); out.write(b4)
      var j = 0
      while (j < size - 4) {
        out.write(if (data.length == 0) 0 else data((k + j) % data.length) & 0xff)
        j += 1
      }
      k += 1
    }
    if (id % 4 == 1) {
      out.write('T'); out.write('A'); out.write('G')
      (0 until 125).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  def encodeMp3(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol).cast("long") >= 0)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, textOrNull) => (id, mp3For(id, utf8Bytes(textOrNull))) }
      .toDF(idCol, "payload")
      .select(
        col(idCol), col("payload"),
        struct(
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("audio/mpeg").as("mime")).as("meta"))
  }

  // ------------------------------------------------------------- parser

  private final class MalformedMp3
      extends RuntimeException("malformed mp3", null, false, false)
  private def fail(): Nothing = throw new MalformedMp3

  final case class Mp3Frame(offset: Long, size: Int, bitrateKbps: Int,
      sampleRate: Int, padded: Boolean, hasCrc: Boolean)

  private[ext] def parseMp3(bytes: Array[Byte], maxFrames: Int = 1 << 20): Option[Seq[Mp3Frame]] = {
    try Some(parseStrict(bytes, maxFrames))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def parseStrict(bytes: Array[Byte], maxFrames: Int): Seq[Mp3Frame] = {
    val n = bytes.length
    var p = 0
    // ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4)
    if (n >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      var size = 0
      var i = 6
      while (i < 10) {
        val b = bytes(i) & 0xff
        if ((b & 0x80) != 0) fail() // syncsafe bytes have the top bit clear
        size = (size << 7) | b
        i += 1
      }
      p = 10 + size
      if (p > n) fail()
    }
    // ID3v1 trailer: fixed 128 bytes starting "TAG"
    var end = n
    if (n - p >= 128 && bytes(n - 128) == 'T' && bytes(n - 127) == 'A' && bytes(n - 126) == 'G')
      end = n - 128
    val frames = Seq.newBuilder[Mp3Frame]
    var count = 0
    while (p < end) {
      if (count >= maxFrames) fail()
      if (p + 4 > end) fail() // truncated header
      val b1 = bytes(p) & 0xff
      val b2 = bytes(p + 1) & 0xff
      val b3 = bytes(p + 2) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) fail() // lost sync
      val version = (b2 >> 3) & 3
      val layer = (b2 >> 1) & 3
      if (version != 3 || layer != 1) fail() // MPEG-1 Layer III only
      val hasCrc = (b2 & 1) == 0
      val bi = (b3 >> 4) & 0xf
      val si = (b3 >> 2) & 3
      val pad = (b3 >> 1) & 1
      if (bi == 0 || bi == 15 || si == 3) fail() // free/bad bitrate, reserved rate
      val size = frameSize(bi, si, pad)
      if (p + size > end) fail() // truncated last frame
      frames += Mp3Frame(p.toLong, size, BitrateKbps(bi), SampleRate(si), pad == 1, hasCrc)
      p += size
      count += 1
    }
    if (count == 0) fail() // a tag with no frames is not an mp3
    frames.result()
  }

  final case class Mp3FrameRow(doc_id: Long, frame_idx: Long, offset: Long,
      n_bytes: Long, bitrate_kbps: Long, sample_rate: Long, checksum: Long)

  /** The operator: payloads → the frame index with per-frame payload
    * checksums; malformed documents drop whole.
    */
  def mp3Frames(withBinary: DataFrame, idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[Mp3FrameRow] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty)
        parseMp3(bytes).toSeq.flatMap { frames =>
          frames.zipWithIndex.map { case (f, k) =>
            var c = 0L
            var j = (f.offset + 4).toInt
            val fend = (f.offset + f.size).toInt
            while (j < fend) { c = (c * 31 + (bytes(j) & 0xff)) % 1000000007L; j += 1 }
            Mp3FrameRow(id, k.toLong, f.offset, f.size.toLong,
              f.bitrateKbps.toLong, f.sampleRate.toLong, c)
          }
        }
      }
  }
}
