package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SubtitlesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("timestamp grammar: both separators, optional hours, reject table") {
    assert(Subtitles.parseTimestamp("01:02:03,456", ',') == 3723456L)
    assert(Subtitles.parseTimestamp("01:02:03.456", '.') == 3723456L)
    assert(Subtitles.parseTimestamp("02:03.456", '.') == 123456L) // VTT hourless
    assert(Subtitles.parseTimestamp("99:00:00.000", '.') == 99L * 3600000)
    for (bad <- Seq("1:2", "01:02:03.45", "01:02:03.4567", "01:02:60.000",
      "01:0a:03.000", "01:02:03,456", "", "01:02:03",
      "99:00.000", "01:60:00.000")) // minutes 00-59 in BOTH forms
      intercept[RuntimeException](Subtitles.parseTimestamp(bad, '.'))
  }

  test("SRT: index lines, CRLF, multi-line cues, blank-line separation") {
    val srt = "1\r\n00:00:01,000 --> 00:00:02,500\r\nfirst line\r\nsecond line\r\n\r\n" +
      "2\r\n00:00:03,000 --> 00:00:04,000\r\nsolo\r\n"
    val cues = Subtitles.parseSubtitles(5L, srt)
    assert(cues.length == 2)
    assert(cues(0).start_ms == 1000 && cues(0).end_ms == 2500)
    assert(cues(0).n_chars == "first line\nsecond line".getBytes("UTF-8").length)
    assert(cues(1).cue_idx == 1 && cues(1).start_ms == 3000)
  }

  test("WebVTT: magic, NOTE blocks, identifiers, settings, hourless times") {
    val vtt = "WEBVTT header text\n\nNOTE\nskip me\nand me\n\n" +
      "00:01.000 --> 00:02.000 align:start\nhello\n\n" +
      "ident-x\n00:00:03.000 --> 00:00:04.000\nworld\n"
    val cues = Subtitles.parseSubtitles(7L, vtt)
    assert(cues.length == 2)
    assert(cues(0).start_ms == 1000 && cues(0).end_ms == 2000)
    assert(cues(1).start_ms == 3000)
  }

  test("strictness: end before start, bad index, missing arrow all quarantine") {
    import spark.implicits._
    def drops(s: String): Boolean =
      Subtitles.subtitleCues(Seq((1L, s)).toDF("doc_id", "subs")).collect().isEmpty
    assert(drops("1\n00:00:05,000 --> 00:00:01,000\nreversed\n"))
    assert(drops("one\n00:00:01,000 --> 00:00:02,000\nbad index\n"))
    assert(drops("1\nno arrow here\ntext\n"))
    assert(drops("WEBVTT\n\nident\nident2\ntext\n")) // two non-arrow lines
  }

  test("fixture end-to-end: both formats recover the closed-form plane; partition-stable") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val out = Subtitles.subtitleCues(Subtitles.encodeSubtitles(docs)).collect()
    val byDoc = out.groupBy(_.doc_id)
    assert(byDoc.size == 200)
    byDoc.foreach { case (id, cs) =>
      val want = Subtitles.cuesFor(id)
      assert(cs.length == want.length, s"doc $id cue count")
      cs.sortBy(_.cue_idx).zip(want).foreach { case (got, (s, e, t)) =>
        assert(got.start_ms == s && got.end_ms == e, s"doc $id span")
        val tb = t.getBytes("UTF-8")
        var c = 0L
        tb.foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
        assert(got.n_chars == tb.length && got.checksum == c, s"doc $id text")
      }
    }
    // both grammars and the multi-line arm occur
    assert((0L until 200L).exists(_ % 2 == 0) && (0L until 200L).exists(_ % 2 == 1))
    assert(out.exists(c => c.checksum != 0 && byDoc(c.doc_id).nonEmpty))
    val again = Subtitles.subtitleCues(Subtitles.encodeSubtitles(docs.repartition(11))).collect()
    assert(again.map(c => (c.doc_id, c.cue_idx, c.checksum)).sorted.toSeq ==
      out.map(c => (c.doc_id, c.cue_idx, c.checksum)).sorted.toSeq)
  }
}
