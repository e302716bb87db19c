package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== subtitle ingestion (SRT + WebVTT) ========
  *
  * The caption half of a multimodal corpus: video training data is
  * video FRAMES ([[Mp4]], [[Multimodal.parseAvi]]) plus ALIGNED TEXT,
  * and the text ships as SubRip (.srt) or WebVTT (.vtt) — the two
  * de-facto subtitle formats. Both parse to the same cue table
  * (start/end milliseconds + text), which is what caption-frame
  * alignment joins against the demuxers' sample times.
  *
  * Grammar differences handled per spec:
  *  - SRT: numeric cue index line, `HH:MM:SS,mmm --> HH:MM:SS,mmm`
  *    (comma decimal separator), text lines until a blank line.
  *  - WebVTT: `WEBVTT` magic line (optional trailing header text),
  *    optional cue identifiers, `HH:MM:SS.mmm --> HH:MM:SS.mmm` (dot
  *    separator, hours optional), cue settings after the end time
  *    (dropped), NOTE comment blocks skipped.
  *
  * STRICT in the container sense: a malformed timestamp, a cue whose
  * end precedes its start, an SRT index that isn't numeric, or a
  * missing WEBVTT magic quarantines the whole file — subtitle files
  * are small and a broken one signals a broken mux, the same
  * blast-radius logic as every archive family here. Multi-line cue
  * text joins with `\n`; the per-cue checksum covers the joined text
  * so the oracle grades exact text recovery.
  *
  * Scale shape: map-only per file, zero shuffles. No reference
  * citation — north-star scope next to the video demuxers.
  */
object Subtitles {

  private val words = Array("align", "batch", "cue", "delta", "edge", "frame", "glyph", "hold")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ------------------------------------------------------------- fixture

  private def fmtSrt(ms: Long): String =
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d,${ms % 1000}%03d"

  private def fmtVtt(ms: Long): String =
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"

  /** Per-cue closed-form plane: doc `id` carries `2 + nib(1)%3` cues;
    * cue j spans `[base + 4000j, base + 4000j + 1500 + 100·nib(2+j))`
    * with `base = (id%7)·977`, and its text is one or two lines of
    * fixture words (two when `(id+j)%3 == 0` — the multi-line arm).
    */
  private[ext] def cuesFor(id: Long): Seq[(Long, Long, String)] = {
    val m = md5Hex(s"st:$id")
    def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
    def w(i: Int) = words(nib(i) % 8)
    val n = 2 + nib(1) % 3
    (0 until n).map { j =>
      val start = (id % 7) * 977 + 4000L * j
      val end = start + 1500 + 100L * nib(2 + j)
      val line1 = s"cue $j of doc $id: ${w(6 + j)} ${w(9 + j)}"
      val text = if ((id + j) % 3 == 0) line1 + "\n" + s"second line ${w(12 + j)}" else line1
      (start, end, text)
    }
  }

  /** Serialize a doc's cues: SRT on even ids, WebVTT on odd — with each
    * format's hazards (VTT: header text after the magic, a NOTE block,
    * cue identifiers on every other cue, cue settings after the end
    * time; SRT: CRLF line endings on every 3rd doc).
    */
  private[ext] def renderSubtitles(id: Long): String = {
    val cues = cuesFor(id)
    val sb = new StringBuilder
    if (id % 2 == 0) { // SRT
      cues.zipWithIndex.foreach { case ((s, e, t), j) =>
        sb.append(j + 1).append('\n')
        sb.append(fmtSrt(s)).append(" --> ").append(fmtSrt(e)).append('\n')
        sb.append(t).append('\n').append('\n')
      }
      val txt = sb.toString
      if (id % 3 == 0) txt.replace("\n", "\r\n") else txt
    } else { // WebVTT
      sb.append("WEBVTT - generated fixture\n\n")
      sb.append("NOTE\nthis comment block must be skipped\n\n")
      cues.zipWithIndex.foreach { case ((s, e, t), j) =>
        if (j % 2 == 1) sb.append(s"cue-ident-$j\n")
        sb.append(fmtVtt(s)).append(" --> ").append(fmtVtt(e))
        if (j == 0) sb.append(" align:start position:10%") // settings dropped
        sb.append('\n').append(t).append('\n').append('\n')
      }
      sb.toString
    }
  }

  def encodeSubtitles(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      .as[Long]
      .map(id => (id, renderSubtitles(id)))
      .toDF("doc_id", "subs")
  }

  // ------------------------------------------------------------- parser

  private final class MalformedSubs
      extends RuntimeException("malformed subtitles", null, false, false)
  private def fail(): Nothing = throw new MalformedSubs

  /** `HH:MM:SS<sep>mmm` (WebVTT also allows `MM:SS.mmm`) → millis. */
  private[ext] def parseTimestamp(s: String, sep: Char): Long = {
    val parts = s.split(':')
    if (parts.length < 2 || parts.length > 3) fail()
    val last = parts(parts.length - 1)
    val di = last.indexOf(sep)
    if (di < 0) fail()
    val secS = last.substring(0, di)
    val msS = last.substring(di + 1)
    if (msS.length != 3 || secS.isEmpty) fail()
    def num(x: String): Long = {
      if (x.isEmpty || !x.forall(c => c >= '0' && c <= '9')) fail()
      if (x.length > 6) fail()
      x.toLong
    }
    val sec = num(secS)
    val ms = num(msS)
    if (sec > 59) fail()
    val (hh, mm) =
      if (parts.length == 3) (num(parts(0)), num(parts(1)))
      else (0L, num(parts(0)))
    if (mm > 59) fail() // both forms: minutes are 00-59 (hours absorb the rest)
    hh * 3600000 + mm * 60000 + sec * 1000 + ms
  }

  final case class Cue(doc_id: Long, cue_idx: Long, start_ms: Long, end_ms: Long,
      n_chars: Long, checksum: Long)

  private def cueOf(id: Long, idx: Long, start: Long, end: Long, lines: Seq[String]): Cue = {
    if (end < start) fail()
    val text = lines.mkString("\n")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var c = 0L
    bytes.foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
    Cue(id, idx, start, end, bytes.length.toLong, c)
  }

  private[ext] def parseSubtitles(id: Long, raw: String): Seq[Cue] = {
    val lines = raw.split("\n", -1).map(l => if (l.endsWith("\r")) l.dropRight(1) else l)
    val out = Seq.newBuilder[Cue]
    var idx = 0L
    if (lines.headOption.exists(_.startsWith("WEBVTT"))) {
      var i = 1
      while (i < lines.length) {
        if (lines(i).isEmpty) i += 1
        else if (lines(i).startsWith("NOTE")) {
          while (i < lines.length && lines(i).nonEmpty) i += 1 // comment block
        } else {
          var l = lines(i)
          if (!l.contains("-->")) { // optional cue identifier line
            i += 1
            if (i >= lines.length) fail()
            l = lines(i)
            if (!l.contains("-->")) fail()
          }
          val arrow = l.indexOf("-->")
          val startS = l.substring(0, arrow).trim
          val afterArrow = l.substring(arrow + 3).trim
          // cue settings: everything after the first whitespace run
          val sp = afterArrow.indexOf(' ')
          val endS = if (sp < 0) afterArrow else afterArrow.substring(0, sp)
          val start = parseTimestamp(startS, '.')
          val end = parseTimestamp(endS, '.')
          i += 1
          val text = Seq.newBuilder[String]
          while (i < lines.length && lines(i).nonEmpty) { text += lines(i); i += 1 }
          out += cueOf(id, idx, start, end, text.result())
          idx += 1L
        }
      }
    } else {
      var i = 0
      while (i < lines.length) {
        if (lines(i).isEmpty) i += 1
        else {
          val idxLine = lines(i)
          if (!idxLine.forall(c => c >= '0' && c <= '9')) fail() // SRT cue index
          i += 1
          if (i >= lines.length || !lines(i).contains("-->")) fail()
          val l = lines(i)
          val arrow = l.indexOf("-->")
          val start = parseTimestamp(l.substring(0, arrow).trim, ',')
          val end = parseTimestamp(l.substring(arrow + 3).trim, ',')
          i += 1
          val text = Seq.newBuilder[String]
          while (i < lines.length && lines(i).nonEmpty) { text += lines(i); i += 1 }
          out += cueOf(id, idx, start, end, text.result())
          idx += 1L
        }
      }
    }
    out.result()
  }

  /** The operator: subtitle files → the cue table; damage quarantines
    * the whole file.
    */
  def subtitleCues(files: DataFrame, idCol: String = "doc_id",
      subsCol: String = "subs"): Dataset[Cue] = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col(idCol).cast("long"), col(subsCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, raw) =>
        try { if (raw == null) Nil else parseSubtitles(id, raw) }
        catch { case scala.util.control.NonFatal(_) => Nil } // quarantine
      }
  }
}
