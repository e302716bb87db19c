package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== ISO-BMFF (MP4) demux — the sample-table walk ========
  *
  * The modern video container ([[Multimodal.parseAvi]]'s successor):
  * virtually all crawled video is MP4/MOV, and indexing it needs no
  * codec — just the box tree and the four sample tables that map every
  * sample to its bytes and its time:
  *
  *  - `stsz` — sample sizes (uniform field OR per-sample table),
  *  - `stsc` — sample→chunk runs (first_chunk, samples_per_chunk),
  *  - `stco`/`co64` — chunk byte offsets (32- and 64-bit forms),
  *  - `stts` — decode-time deltas as (count, delta) runs.
  *
  * The demuxer walks boxes (32-bit size, `largesize` = 1 form, size 0 =
  * to-EOF), descends moov → trak → mdia, selects the FIRST track whose
  * `hdlr` declares handler `vide` (the AVI `vids` selection contract —
  * an audio track first in file order must not win), reads the `mdhd`
  * timescale version-correctly, then cross-checks the four tables
  * against each other: stsc runs must be monotonic and expand (against
  * the stco chunk count) to EXACTLY the stsz sample count, the stts
  * deltas must also sum to it, and every resolved sample byte range
  * must lie inside the file. Any inconsistency returns None — the
  * malformed-drop convention; all counts are bounds-capped against
  * their box sizes BEFORE allocation, so a hostile header cannot
  * allocate or index out.
  *
  * Scale shape: map-only per payload, zero shuffles; the index is
  * O(#samples) with no decode. At 100 TB this is the container step in
  * front of frame sampling, exactly like the AVI path.
  *
  * No reference citation — the reference has no multimodal path;
  * north-star scope next to [[Multimodal]]'s RIFF/AVI demux.
  */
object Mp4 {

  // ------------------------------------------------------------- writer

  private def utf8Bytes(s: String): Array[Byte] =
    if (s == null) Array.empty else s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Minimal structurally-valid MP4 per doc: `ftyp` (+ a `free` box on
    * every 3rd doc — the skip-unknown hazard), `mdat` FIRST (the
    * non-faststart layout every camera writes), then `moov` holding an
    * AUDIO trak ahead of the video trak on every 2nd doc (the selection
    * hazard), with the video samples chunked in PAIRS (stsc run logic),
    * uniform-stsz 144-byte frames (the uniform arm; the audio trak uses
    * the per-sample arm), stco offsets into mdat, and a two-run stts
    * (every frame 100 ticks, the last 200 when there is more than one).
    * Frame k's plane is the doc's UTF-8 bytes cycled from offset k —
    * [[Multimodal.encodeAvi]]'s model, so the oracles share a byte CTE.
    */
  def encodeMp4(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol).cast("long") >= 0)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, textOrNull) => (id, mp4For(id, utf8Bytes(textOrNull))) }
      .toDF(idCol, "payload")
      .select(
        col(idCol), col("payload"),
        struct(
          octet_length(col("payload")).cast("long").as("n_bytes"),
          lit("video/mp4").as("mime")).as("meta"))
  }

  private val FrameBytes = 144 // 8x6 RGB24, the shared plane model

  private[ext] def mp4For(id: Long, data: Array[Byte]): Array[Byte] = {
    val nf = (1 + java.lang.Math.floorMod(id, 5L)).toInt
    val hasFree = id % 3 == 0
    val hasAudio = id % 2 == 0
    val audioBytes = if (hasAudio) 16 else 0
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def box(tp: String)(body: => Unit): Unit = {
      val sizePos = out.size()
      u32(0); cc(tp)
      body
      val b = out.toByteArray // patch the size field
      val size = b.length - sizePos
      b(sizePos) = ((size >>> 24) & 0xff).toByte
      b(sizePos + 1) = ((size >>> 16) & 0xff).toByte
      b(sizePos + 2) = ((size >>> 8) & 0xff).toByte
      b(sizePos + 3) = (size & 0xff).toByte
      out.reset(); out.write(b, 0, b.length)
    }

    box("ftyp") { cc("isom"); u32(0); cc("isom") }
    if (hasFree) box("free") { u32(0) }
    val mdatDataStart = out.size() + 8
    box("mdat") {
      var a = 0
      while (a < audioBytes) { out.write(0); a += 1 }
      var k = 0
      while (k < nf) {
        var j = 0
        while (j < FrameBytes) {
          out.write(if (data.length == 0) 0 else data((k + j) % data.length) & 0xff)
          j += 1
        }
        k += 1
      }
    }
    val nChunks = (nf + 1) / 2
    def fullBox(tp: String, version: Int)(body: => Unit): Unit =
      box(tp) { u32(version.toLong << 24); body }
    def trak(handler: String, timescale: Int)(stbl: => Unit): Unit =
      box("trak") {
        fullBox("tkhd", 0) { (0 until 20).foreach(_ => u32(0)) }
        box("mdia") {
          fullBox("mdhd", 0) { u32(0); u32(0); u32(timescale.toLong); u32(0); u32(0) }
          fullBox("hdlr", 0) { u32(0); cc(handler); u32(0); u32(0); u32(0); out.write(0) }
          box("minf") { box("stbl") { stbl } }
        }
      }
    box("moov") {
      fullBox("mvhd", 0) {
        u32(0); u32(0); u32(1000); u32(100L * nf) // created, modified, timescale, duration
        (0 until 20).foreach(_ => u32(0))
      }
      if (hasAudio) trak("soun", 8000) {
        fullBox("stsd", 0) { u32(1); box("raw ") { u32(0); u32(0) } }
        fullBox("stts", 0) { u32(1); u32(1); u32(160) }
        fullBox("stsc", 0) { u32(1); u32(1); u32(1); u32(1) }
        fullBox("stsz", 0) { u32(0); u32(1); u32(16) } // per-sample arm
        fullBox("stco", 0) { u32(1); u32(mdatDataStart.toLong) }
      }
      trak("vide", 1000) {
        fullBox("stsd", 0) { u32(1); box("raw ") { u32(0); u32(0) } }
        fullBox("stts", 0) {
          if (nf == 1) { u32(1); u32(1); u32(100) }
          else { u32(2); u32(nf - 1L); u32(100); u32(1); u32(200) }
        }
        fullBox("stsc", 0) {
          if (nf == 1) { u32(1); u32(1); u32(1); u32(1) }
          else if (nf % 2 == 0) { u32(1); u32(1); u32(2); u32(1) }
          else { u32(2); u32(1); u32(2); u32(1); u32(nChunks.toLong); u32(1); u32(1) }
        }
        fullBox("stsz", 0) { u32(FrameBytes.toLong); u32(nf.toLong) } // uniform arm
        fullBox("stco", 0) {
          u32(nChunks.toLong)
          var c = 0
          while (c < nChunks) { u32(mdatDataStart.toLong + audioBytes + 288L * c); c += 1 }
        }
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- parser

  /** One resolved video sample: real byte range + decode time. */
  final case class SampleRef(offset: Long, size: Long, chunk: Int, dts: Long, dur: Long)
  final case class TrackIndex(timescale: Long, samples: Seq[SampleRef])

  private final class MalformedMp4
      extends RuntimeException("malformed mp4", null, false, false)
  private def fail(): Nothing = throw new MalformedMp4

  /** Demux the first `vide` track of an ISO-BMFF file (see object
    * scaladoc for the validation contract). None on any malformation.
    */
  private[ext] def parseMp4(bytes: Array[Byte], maxSamples: Int = 1 << 20): Option[TrackIndex] = {
    try Some(parseStrict(bytes, maxSamples))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def parseStrict(bytes: Array[Byte], maxSamples: Int): TrackIndex = {
    val n = bytes.length.toLong
    def u32(p: Long): Long = {
      if (p + 4 > n) fail()
      val i = p.toInt
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    }
    def u64(p: Long): Long = (u32(p) << 32) | u32(p + 4)
    def fourcc(p: Long): String = {
      if (p + 4 > n) fail()
      new String(bytes, p.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
    }
    // walk the boxes in [from, until); call f(type, bodyFrom, bodyUntil)
    def walk(from: Long, until: Long)(f: (String, Long, Long) => Unit): Unit = {
      var p = from
      while (p + 8 <= until) {
        val size0 = u32(p)
        val tp = fourcc(p + 4)
        var bodyStart = p + 8
        val boxEnd =
          if (size0 == 0) until
          else if (size0 == 1) { val ls = u64(p + 8); bodyStart = p + 16; p + ls }
          else p + size0
        if (boxEnd < bodyStart || boxEnd > until) fail()
        f(tp, bodyStart, boxEnd)
        p = boxEnd
      }
    }

    var result: Option[TrackIndex] = None
    walk(0, n) { (tp, bs, be) =>
      if (tp == "moov" && result.isEmpty) {
        walk(bs, be) { (t2, ts, te) =>
          if (t2 == "trak" && result.isEmpty) {
            var handler = ""
            var timescale = 0L
            var stts: Option[(Long, Long)] = None
            var stsc: Option[(Long, Long)] = None
            var stsz: Option[(Long, Long)] = None
            var stco: Option[(Long, Long, Boolean)] = None
            walk(ts, te) { (t3, ms, me) =>
              if (t3 == "mdia") walk(ms, me) { (t4, is, ie) =>
                if (t4 == "mdhd") {
                  // v0: ver/flags + 2×u32 times; v1: ver/flags + 2×u64
                  // times — timescale sits at +12 / +20 from the body
                  val version = (u32(is) >>> 24) & 0xff
                  timescale = if (version == 1) u32(is + 4 + 16) else u32(is + 4 + 8)
                } else if (t4 == "hdlr") {
                  if (ie - is >= 12) handler = fourcc(is + 8)
                } else if (t4 == "minf") walk(is, ie) { (t5, ss, se) =>
                  if (t5 == "stbl") walk(ss, se) { (t6, bs6, be6) =>
                    t6 match {
                      case "stts" => stts = Some((bs6, be6))
                      case "stsc" => stsc = Some((bs6, be6))
                      case "stsz" => stsz = Some((bs6, be6))
                      case "stco" => stco = Some((bs6, be6, false))
                      case "co64" => stco = Some((bs6, be6, true))
                      case _ => ()
                    }
                  }
                }
              }
            }
            if (handler == "vide") {
              val (szB, szE) = stsz.getOrElse(fail())
              val uniform = u32(szB + 4)
              val count = u32(szB + 8)
              if (count > maxSamples || count < 0) fail()
              val nSamples = count.toInt
              if (uniform == 0 && szB + 12 + 4L * nSamples > szE) fail()
              val sizes = Array.tabulate(nSamples) { i =>
                if (uniform != 0) uniform else u32(szB + 12 + 4L * i)
              }
              val (coB, coE, wide) = stco.getOrElse(fail())
              val nChunks0 = u32(coB + 4)
              val entryW = if (wide) 8 else 4
              if (nChunks0 > maxSamples || coB + 8 + entryW.toLong * nChunks0 > coE) fail()
              val nChunks = nChunks0.toInt
              val chunkOff = Array.tabulate(nChunks) { i =>
                if (wide) u64(coB + 8 + 8L * i) else u32(coB + 8 + 4L * i)
              }
              val (scB, scE) = stsc.getOrElse(fail())
              val nRuns0 = u32(scB + 4)
              if (nRuns0 > maxSamples || scB + 8 + 12L * nRuns0 > scE) fail()
              val nRuns = nRuns0.toInt
              val runs = Array.tabulate(nRuns) { i =>
                (u32(scB + 8 + 12L * i), u32(scB + 12 + 12L * i)) // (first_chunk 1-based, samples_per_chunk)
              }
              if (nRuns == 0 && nSamples > 0) fail()
              if (nRuns > 0 && runs(0)._1 != 1) fail() // chunks before run 1 have no rule
              var r = 0
              while (r < nRuns) {
                if (runs(r)._1 < 1 || runs(r)._1 > nChunks ||
                  (r > 0 && runs(r)._1 <= runs(r - 1)._1) || runs(r)._2 <= 0) fail()
                r += 1
              }
              // expand runs against the chunk count -> per-sample (chunk, offset)
              val offsets = new Array[Long](nSamples)
              val chunkIdx = new Array[Int](nSamples)
              var s = 0
              r = 0
              var chunk = 0
              while (chunk < nChunks) {
                if (r + 1 < nRuns && chunk + 1 >= runs(r + 1)._1) r += 1
                val perChunk = runs(r)._2
                var off = chunkOff(chunk)
                var j = 0L
                while (j < perChunk) {
                  if (s >= nSamples) fail() // stsc expands past stsz
                  offsets(s) = off
                  chunkIdx(s) = chunk
                  off += sizes(s)
                  if (offsets(s) < 0 || offsets(s) + sizes(s) > n) fail()
                  s += 1
                  j += 1
                }
                chunk += 1
              }
              if (s != nSamples) fail() // stsc expands short of stsz
              val (ttB, ttE) = stts.getOrElse(fail())
              val nTT0 = u32(ttB + 4)
              if (nTT0 > maxSamples || ttB + 8 + 8L * nTT0 > ttE) fail()
              val durs = new Array[Long](nSamples)
              var dts = 0L
              var si = 0
              var ti = 0
              val sampleRefs = Vector.newBuilder[SampleRef]
              while (ti < nTT0.toInt) {
                val cnt = u32(ttB + 8 + 8L * ti)
                val delta = u32(ttB + 12 + 8L * ti)
                var j = 0L
                while (j < cnt) {
                  if (si >= nSamples) fail() // stts sums past stsz
                  durs(si) = delta
                  si += 1
                  j += 1
                }
                ti += 1
              }
              if (si != nSamples) fail() // stts sums short of stsz
              si = 0
              while (si < nSamples) {
                sampleRefs += SampleRef(offsets(si), sizes(si), chunkIdx(si), dts, durs(si))
                dts += durs(si)
                si += 1
              }
              result = Some(TrackIndex(timescale, sampleRefs.result()))
            }
          }
        }
      }
    }
    result.getOrElse(fail())
  }

  // ------------------------------------------------------------ operator

  final case class Mp4Sample(doc_id: Long, sample_idx: Long, chunk_idx: Long,
      offset: Long, n_bytes: Long, dts: Long, dur: Long, checksum: Long)

  /** The operator: containers → the resolved video sample table, each
    * sample's REAL bytes reduced to the usual rolling checksum. Malformed
    * containers drop (the quarantine convention); map-only.
    */
  def mp4SampleTable(withBinary: DataFrame, idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[Mp4Sample] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.empty)
        parseMp4(bytes).toSeq.flatMap { idx =>
          idx.samples.zipWithIndex.map { case (sr, k) =>
            var c = 0L
            var j = sr.offset.toInt
            val end = (sr.offset + sr.size).toInt
            while (j < end) { c = (c * 31 + (bytes(j) & 0xff)) % 1000000007L; j += 1 }
            Mp4Sample(id, k.toLong, sr.chunk.toLong, sr.offset, sr.size, sr.dts, sr.dur, c)
          }
        }
      }
  }
}
