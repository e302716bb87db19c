package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PunycodeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("RFC 3492 section 7.1 sample strings encode and decode exactly") {
    // (unicode code points, expected punycode) from the RFC's sample set
    val cases = Seq(
      // Arabic (Egyptian)
      (Seq(0x0644, 0x064A, 0x0647, 0x0645, 0x0627, 0x0628, 0x062A, 0x0643, 0x0644,
        0x0645, 0x0648, 0x0634, 0x0639, 0x0631, 0x0628, 0x064A, 0x061F), "egbpdaj6bu4bxfgehfvwxn"),
      // Simplified Chinese
      (Seq(0x4ED6, 0x4EEC, 0x4E3A, 0x4EC0, 0x4E48, 0x4E0D, 0x8BF4, 0x4E2D, 0x6587),
        "ihqwcrb4cv8a8dqg056pqjye"),
      // Czech
      (Seq(0x0050, 0x0072, 0x006F, 0x010D, 0x0070, 0x0072, 0x006F, 0x0073, 0x0074,
        0x011B, 0x006E, 0x0065, 0x006D, 0x006C, 0x0075, 0x0076, 0x00ED, 0x010D,
        0x0065, 0x0073, 0x006B, 0x0079), "Proprostnemluvesky-uyb24dma41a"),
      // Japanese (katakana + kanji mix)
      (Seq(0x306A, 0x305C, 0x307F, 0x3093, 0x306A, 0x65E5, 0x672C, 0x8A9E, 0x3092,
        0x8A71, 0x3057, 0x3066, 0x304F, 0x308C, 0x306A, 0x3044, 0x306E, 0x304B),
        "n8jok5ay5dzabd5bym9f0cm5685rrjetr6pdxa"))
    cases.foreach { case (cps, puny) =>
      val s = new String(cps.toArray.flatMap(Character.toChars), 0, cps.map(Character.charCount).sum)
      // RFC samples preserve case in the basic region; our encoder is used
      // after lowercasing, so compare case-insensitively on the basic part
      assert(Punycode.encodeLabel(s).toLowerCase == puny.toLowerCase, s"encode $puny")
      assert(Punycode.decodeLabel(puny) == s, s"decode $puny")
    }
  }

  test("differential: both directions agree with java.net.IDN on the fixture space") {
    (0L until 400L).foreach { id =>
      val host = Punycode.fixtureHost(id)
      val ascii = Punycode.toAscii(host)
      assert(ascii == java.net.IDN.toASCII(host), s"toAscii($host)")
      assert(Punycode.toUnicode(ascii) == java.net.IDN.toUnicode(ascii), s"toUnicode($ascii)")
      assert(Punycode.toUnicode(ascii) == host, s"round trip $host")
    }
    // richer labels: multiple specials, specials at both ends, all-unicode
    val extra = Seq("münchen", "bücher", "中文网", "россия", "ελλάδα", "écolé",
      "a中b", "中a中", "ñ", "日本語ドメイン")
    extra.foreach { label =>
      val host = label + ".example"
      val ascii = Punycode.toAscii(host)
      assert(ascii == java.net.IDN.toASCII(host), s"toAscii($host)")
      assert(Punycode.toUnicode(ascii) == host, s"round trip $host")
    }
  }

  test("strict decode: malformed labels are rejected, never misread") {
    def bad(s: String) = intercept[Punycode.MalformedPunycode](Punycode.decodeLabel(s))
    bad("abcé-x") // non-basic code point in the basic region
    bad("abc-!!") // invalid digit
    // overflow: huge deltas past 0x10FFFF
    bad("abc-99999999h")
    // a digit run that never terminates (all continuation-range digits)
    bad("abc-zzzzzzzzzzzzzzzzzz")
  }

  test("idnaSignal: end-to-end over doc ids, ASCII fast path included") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val got = Punycode.idnaSignal(docs).collect().map(h => h.doc_id -> h).toMap
    assert(got.size == 200)
    (0L until 200L).foreach { id =>
      val h = got(id)
      assert(h.host_unicode == Punycode.fixtureHost(id), s"doc $id")
      assert(h.n_idn_labels == (if (id % 5 == 0) 0L else 1L))
    }
  }
}
