package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RtfSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def model(id: Long, k: Int): (Long, Long) = {
    val text = Rtf.paraText(id, k)
    val b = text.getBytes("UTF-8")
    var cs = 0L
    b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
    (b.length.toLong, cs)
  }

  test("round-trip: reader recovers the closed-form model across all writer arms") {
    for (id <- 0L until 64L) {
      val paras = Rtf.parseRtf(id, Rtf.renderRtf(id))
      assert(paras.length == Rtf.nParas(id), s"doc $id paragraph count")
      val expectedTitle = if (id % 7 == 6) "" else Rtf.docTitle(id)
      paras.foreach { p =>
        val (nc, cs) = model(id, p.para_idx.toInt)
        assert(p.title == expectedTitle, s"doc $id title")
        assert(p.n_chars == nc && p.checksum == cs, s"doc $id para ${p.para_idx}")
      }
    }
  }

  test("tokenizer semantics: delimiter rule, uc protocol, destinations, bin, control symbols") {
    def paras(rtf: String): Seq[String] = {
      val rows = Rtf.parseRtf(7L, rtf.getBytes("ISO-8859-1"))
      // recover text via the model-free route: re-parse returning checksums
      // is opaque, so test through a known single paragraph's n_chars
      rows.map(_.n_chars.toString)
    }
    def text1(rtf: String): (Long, Long, String) = {
      val rows = Rtf.parseRtf(7L, rtf.getBytes("ISO-8859-1"))
      assert(rows.length == 1)
      (rows.head.n_chars, rows.head.checksum, rows.head.title)
    }
    def cs(s: String): Long = {
      var c = 0L
      s.getBytes("UTF-8").foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
      c
    }
    // control-word delimiter: ONE space consumed, a second is text
    val (n1, c1, _) = text1("{\\rtf1\\ansi\\b  bold\\b0\\par}")
    assert(c1 == cs(" bold")) // first space is \b's delimiter, second is text
    // \uc0: no fallback skip; \uc2: two fallback units (one a \'hh)
    val (_, c2, _) = text1("{\\rtf1\\uc0\\u233 X\\uc2\\u8212ab Y\\par}")
    assert(c2 == cs("éX— Y"))
    val (_, c2b, _) = text1("{\\rtf1\\uc2\\u8212\\'3fb Y\\par}")
    assert(c2b == cs("— Y")) // the \'3f and 'b' both eaten as fallback
    // negative \u wire form: -4064 + 65536 = 61472
    val (_, c3, _) = text1("{\\rtf1\\uc0\\u-4064 Z\\par}")
    assert(c3 == cs("\uF020Z"))
    // destination skipping + nested groups + title routing
    val (_, c4, t4) = text1(
      "{\\rtf1{\\fonttbl{\\f0 Times;}}{\\info{\\title My \\{escaped\\} title}}{\\*\\weird junk}body\\par}")
    assert(c4 == cs("body") && t4 == "My {escaped} title")
    // \bin skips raw bytes (including braces) without interpreting them
    val (_, c5, _) = text1("{\\rtf1 a\\bin5 }}}{{b\\par}")
    assert(c5 == cs("ab"))
    // raw CR/LF invisible; \line and \tab visible
    val (_, c6, _) = text1("{\\rtf1 a\r\nb\\line c\\tab d\\par}")
    assert(c6 == cs("ab\nc\td"))
    assert(paras("{\\rtf1 a\\par b\\par c\\par}").length == 3)
    // an unterminated final paragraph still emits
    assert(paras("{\\rtf1 a\\par tail}").length == 2)
    // an ignorable destination with NESTED groups stays skipped after the
    // inner group closes (the review-pass regression: {\*\listtable{...}})
    val (_, c7, _) = text1("{\\rtf1{\\*\\listtable{\\list\\listid1 junk}LEAK}body\\par}")
    assert(c7 == cs("body"))
    // same for a known destination word
    val (_, c8, _) = text1("{\\rtf1{\\fonttbl{\\f0 Times;}ALSO-LEAK}body\\par}")
    assert(c8 == cs("body"))
  }

  test("malformed documents quarantine: magic, braces, escapes, bin overrun") {
    def bad(rtf: String): Unit =
      intercept[RuntimeException](Rtf.parseRtf(1L, rtf.getBytes("ISO-8859-1")))
    bad("not rtf at all")
    bad("{\\rtf2 wrong version... actually }") // magic is {\rtf1
    bad("{\\rtf1 unbalanced")
    bad("{\\rtf1 too}many}closes}")
    bad("{\\rtf1 bad hex \\'zq\\par}")
    bad("{\\rtf1 overrun \\bin999 x\\par}")
    bad("{\\rtf1 \\u no-param\\par}")
    bad("{\\rtf1 trailing}garbage")
  }

  test("operator: per-paragraph table, damage quarantines per document") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val rows = Rtf.rtfExtract(Rtf.encodeRtf(docs)).collect()
    val expected = (0L until 24L).map(id => id -> Rtf.nParas(id)).toMap
    assert(rows.groupBy(_.doc_id).view.mapValues(_.length).toMap == expected)
    val mixed = Rtf.encodeRtf(docs.filter($"doc_id" < 2)).as[(Long, Array[Byte])]
      .map { case (id, p) => if (id == 0L) (id, p.dropRight(1)) else (id, p) } // lost root }
      .toDF("doc_id", "payload")
    assert(Rtf.rtfExtract(mixed).collect().map(_.doc_id).distinct.sameElements(Array(1L)))
  }
}
