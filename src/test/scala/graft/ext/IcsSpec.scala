package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class IcsSpec extends AnyFunSuite {

  test("round-trip: folding, escapes, quoted-param colon, epoch math") {
    for (id <- 0L until 64L) {
      val events = Ics.parseIcs(id, Ics.renderIcs(id))
      assert(events.length == Ics.nEvents(id), s"cal $id event count")
      events.foreach { ev =>
        val e = ev.event_idx.toInt
        assert(ev.uid == Ics.uidOf(id, e), s"cal $id uid")
        assert(ev.start_epoch == Ics.startEpoch(id, e), s"cal $id epoch")
        assert(ev.summary == Ics.summaryOf(id, e), s"cal $id summary")
        val b = Ics.descriptionOf(id, e).getBytes("UTF-8")
        var cs = 0L
        b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
        assert(ev.desc_n_chars == b.length && ev.desc_checksum == cs, s"cal $id desc")
      }
      // every fixture actually folds: a continuation line exists
      assert(Ics.renderIcs(id).contains("\r\n "), s"cal $id folds")
    }
  }

  test("unfold: CRLF+SP and LF+TAB both delete; non-fold whitespace survives") {
    assert(Ics.unfold("A:one\r\n  two\r\nB:x") == Seq("A:one two", "B:x"))
    assert(Ics.unfold("A:one\n\ttwo") == Seq("A:onetwo"))
    assert(Ics.unfold("A:a b\r\nB:c") == Seq("A:a b", "B:c"))
  }

  test("unescape: the four legal escapes; anything else is damage") {
    assert(Ics.unescapeText("a\\,b\\;c\\\\d\\ne\\Nf") == "a,b;c\\d\ne\nf")
    assertThrows[RuntimeException](Ics.unescapeText("bad\\tescape"))
    assertThrows[RuntimeException](Ics.unescapeText("trailing\\"))
  }

  test("splitLine honors quoted parameters; DTSTART validation gates") {
    assert(Ics.splitLine("SUMMARY;X=\"a:b\";Y=2:value:with:colons") ==
      ("SUMMARY", "value:with:colons"))
    assertThrows[RuntimeException](Ics.splitLine("NOVALUE"))
    assert(Ics.parseDtstartUtc("20240229T120000Z") ==
      java.time.LocalDate.of(2024, 2, 29).toEpochDay * 86400L + 12 * 3600L)
    assertThrows[RuntimeException](Ics.parseDtstartUtc("20230229T120000Z")) // not a leap year
    assertThrows[RuntimeException](Ics.parseDtstartUtc("20240101T120000")) // no Z
    assertThrows[RuntimeException](Ics.parseDtstartUtc("2024-01-01T12:00Z")) // extended form
  }

  test("damage: nesting, unterminated event, missing DTSTART all quarantine") {
    val good = Ics.renderIcs(1L)
    assert(Ics.parseIcsSafe(1L, good).nonEmpty)
    assert(Ics.parseIcsSafe(1L, good.replace("END:VEVENT", "X-END:VEVENT")).isEmpty)
    assert(Ics.parseIcsSafe(1L, good.replaceFirst("DTSTART", "X-DTSTART")).isEmpty)
    assert(Ics.parseIcsSafe(1L, good.replace("BEGIN:VCALENDAR\r\n", "")).isEmpty)
    assert(Ics.parseIcsSafe(1L, "").isEmpty)
  }

  test("operator: damaged calendar quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val encoded = Ics.encodeIcs(docs)
    val mixed = encoded.as[(Long, String)].map { case (id, t) =>
      if (id == 4L) (id, t.substring(0, t.length / 2)) else (id, t)
    }.toDF("doc_id", "ics_text")
    val got = Ics.icsEvents(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(4L))
    for (id <- (0L until 24L) if id != 4L)
      assert(byDoc(id).length == Ics.nEvents(id), s"cal $id")
  }
}
