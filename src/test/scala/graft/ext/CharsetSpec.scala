package graft.ext

import java.nio.charset.{Charset => JCharset, CodingErrorAction}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Truth tables for the from-scratch WHATWG charset stack: each decoder
  * is differentialed against the JDK's independent implementation
  * (CodingErrorAction.REPLACE), with the one documented divergence —
  * the five cp1252 bytes WHATWG maps to C1 controls where the JDK
  * replaces — pinned explicitly.
  */
class CharsetSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def jdk(bytes: Array[Byte], cs: String): String =
    JCharset.forName(cs).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
      .decode(java.nio.ByteBuffer.wrap(bytes)).toString

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ------------------------------------------------------------------
  // windows-1252
  // ------------------------------------------------------------------

  test("cp1252 decode matches the JDK on all 251 assigned bytes; the 5 WHATWG C1 holes pinned") {
    val holes = Set(0x81, 0x8d, 0x8f, 0x90, 0x9d)
    for (b <- 0 to 255) {
      val got = Charset.cp1252Decode(bytes(b))
      if (holes(b)) assert(got == b.toChar.toString, f"hole byte $b%02x → C1 control per WHATWG")
      else assert(got == jdk(bytes(b), "windows-1252"), f"byte $b%02x")
    }
  }

  test("cp1252 encode/decode round-trips every decodable char; unmappable throws") {
    for (b <- 0 to 255; if !Set(0x81, 0x8d, 0x8f, 0x90, 0x9d)(b)) {
      val s = Charset.cp1252Decode(bytes(b))
      assert(Charset.cp1252Encode(s).head == b.toByte, f"byte $b%02x")
    }
    intercept[IllegalArgumentException](Charset.cp1252Encode("Ω"))
  }

  // ------------------------------------------------------------------
  // UTF-8 with replacement (maximal subpart)
  // ------------------------------------------------------------------

  test("utf-8 replacement decode: maximal-subpart truth table") {
    def d(xs: Int*) = Charset.utf8DecodeReplace(bytes(xs: _*))
    assert(d() == "")
    assert(d(0x61, 0xc3, 0xa9) == "aé")
    // truncated 2-byte tail: ONE replacement
    assert(d(0x63, 0xe9) == "c�")
    // lead + interrupting ASCII: replacement then the ASCII reprocessed
    assert(d(0xe9, 0x41) == "�A")
    // E1 A0 then invalid: whole consumed prefix is one replacement, 'A' survives
    assert(d(0xe1, 0xa0, 0x41) == "�A")
    // F4 90: second byte out of range for F4 → FFFD, then 90 80 80 orphans
    assert(d(0xf4, 0x90, 0x80, 0x80) == "����")
    // overlong/surrogate guards
    assert(d(0xc0, 0xaf) == "��")
    assert(d(0xed, 0xa0, 0x80) == "���")
    // astral plane round trip
    assert(d("🎉".getBytes("UTF-8").map(_ & 0xff).toSeq: _*) == "🎉")
  }

  /** The JDK and WHATWG agree on maximal-subpart replacement EXCEPT when a
    * constrained lead (E0/ED/F0/F4) is followed by a continuation byte
    * outside its narrowed first-continuation range (e.g. `ED A9`): WHATWG
    * replaces the lead and REPROCESSES the continuation (two U+FFFD),
    * the JDK consumes both as one malformed unit (one U+FFFD). Browsers
    * follow WHATWG; so does [[Charset.utf8DecodeReplace]].
    */
  private def jdkUtf8Divergent(a: Array[Byte]): Boolean =
    a.sliding(2).exists { w =>
      w.length == 2 && {
        val lead = w(0) & 0xff; val c = w(1) & 0xff
        (c >= 0x80 && c <= 0xbf) && (
          (lead == 0xe0 && c < 0xa0) || (lead == 0xed && c > 0x9f) ||
          (lead == 0xf0 && c < 0x90) || (lead == 0xf4 && c > 0x8f))
      }
    }

  test("utf-8 replacement decode: WHATWG-vs-JDK divergence corners pinned") {
    def d(xs: Int*) = Charset.utf8DecodeReplace(bytes(xs: _*))
    // ED A9: lead consumed alone (FFFD), A9 reprocessed as an orphan (FFFD)
    assert(d(0xed, 0xa9, 0x4c) == "��L")
    assert(jdk(bytes(0xed, 0xa9, 0x4c), "UTF-8") == "�L") // the JDK's single-unit take
    assert(d(0xe0, 0x80) == "��")
    assert(d(0xf0, 0x8f, 0x41) == "��A")
  }

  test("utf-8 replacement decode: differential fuzz vs the JDK decoder") {
    val rnd = new scala.util.Random(0x5ca1ab1e)
    var ran = 0
    for (trial <- 0 until 2000) {
      val n = rnd.nextInt(24)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      // bias half the trials toward near-valid UTF-8 (mutate one byte of real text)
      val arr =
        if (trial % 2 == 0) b
        else {
          val base = ("héllo ☃ 🎉 ß" * (1 + n % 3)).getBytes("UTF-8")
          if (n > 0 && base.nonEmpty) base(rnd.nextInt(base.length)) = b(0)
          base
        }
      if (!jdkUtf8Divergent(arr)) {
        ran += 1
        assert(Charset.utf8DecodeReplace(arr) == jdk(arr, "UTF-8"),
          arr.map(x => f"${x & 0xff}%02x").mkString(" "))
      }
    }
    assert(ran > 1200, s"divergence filter ate the fuzz corpus: $ran/2000")
  }

  // ------------------------------------------------------------------
  // UTF-16
  // ------------------------------------------------------------------

  /** Same divergence class as UTF-8: a lead surrogate followed by a
    * non-trail unit is one JDK malformed unit (one U+FFFD for both),
    * where WHATWG replaces the lead and REPROCESSES the unit.
    */
  private def jdkUtf16Divergent(b: Array[Byte], le: Boolean): Boolean = {
    val units = b.grouped(2).collect { case Array(x, y) =>
      if (le) (x & 0xff) | ((y & 0xff) << 8) else ((x & 0xff) << 8) | (y & 0xff)
    }.toArray
    units.indices.exists { i =>
      units(i) >= 0xd800 && units(i) <= 0xdbff &&
        (i + 1 >= units.length && b.length % 2 == 1 || // lead then odd tail byte
          (i + 1 < units.length && !(units(i + 1) >= 0xdc00 && units(i + 1) <= 0xdfff)))
    }
  }

  test("utf-16 decode: WHATWG-vs-JDK divergence corner pinned") {
    // lead surrogate D8A6 then U+0828: WHATWG replaces the lead and keeps ࠨ
    assert(Charset.utf16Decode(bytes(0xa6, 0xd8, 0x28, 0x08), littleEndian = true) == "\ufffd\u0828")
    assert(jdk(bytes(0xa6, 0xd8, 0x28, 0x08), "UTF-16LE") == "�") // JDK eats both units
  }

  test("utf-16 LE/BE decode: differential fuzz vs the JDK decoder") {
    val rnd = new scala.util.Random(0xcafe)
    var ran = 0
    for (_ <- 0 until 2000) {
      val n = rnd.nextInt(20)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      if (!jdkUtf16Divergent(b, le = true)) {
        ran += 1
        assert(Charset.utf16Decode(b, littleEndian = true) == jdk(b, "UTF-16LE"),
          "LE " + b.map(x => f"${x & 0xff}%02x").mkString(" "))
      }
      if (!jdkUtf16Divergent(b, le = false)) {
        assert(Charset.utf16Decode(b, littleEndian = false) == jdk(b, "UTF-16BE"),
          "BE " + b.map(x => f"${x & 0xff}%02x").mkString(" "))
      }
    }
    assert(ran > 1200, s"divergence filter ate the fuzz corpus: $ran/2000")
  }

  // ------------------------------------------------------------------
  // Detection precedence + label resolution
  // ------------------------------------------------------------------

  test("label resolution: aliases, case folding, unknowns") {
    assert(Charset.resolveLabel("UTF-8").contains("utf-8"))
    assert(Charset.resolveLabel(" utf8 ").contains("utf-8"))
    assert(Charset.resolveLabel("ISO-8859-1").contains("windows-1252"))
    assert(Charset.resolveLabel("Latin1").contains("windows-1252"))
    assert(Charset.resolveLabel("us-ascii").contains("windows-1252"))
    assert(Charset.resolveLabel("UTF-16").contains("utf-16le"))
    assert(Charset.resolveLabel("utf-16be").contains("utf-16be"))
    assert(Charset.resolveLabel("koi8-r").isEmpty) // outside the decoded subset
    assert(Charset.resolveLabel(null).isEmpty)
  }

  test("header charset param: quoted, spaced, absent") {
    assert(Charset.headerCharset("text/html; charset=utf-8").contains("utf-8"))
    assert(Charset.headerCharset("""text/html; charset="UTF-8"""").contains("UTF-8"))
    assert(Charset.headerCharset("text/html; boundary=x; CHARSET= latin1 ").contains("latin1"))
    assert(Charset.headerCharset("text/html").isEmpty)
    assert(Charset.headerCharset(null).isEmpty)
  }

  test("meta prescan: charset attr, http-equiv form, quoting, 1024-byte budget") {
    def m(s: String) = Charset.metaCharset(s.getBytes("ISO-8859-1"))
    assert(m("""<html><meta charset="utf-8"><body>""").contains("utf-8"))
    assert(m("""<META CHARSET=UTF-8>""").contains("utf-8"))
    assert(m("""<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">""")
      .contains("iso-8859-1"))
    // unknown label in the first meta: scan continues to the next
    assert(m("""<meta charset="ebcdic"><meta charset="utf-8">""").contains("utf-8"))
    // charset= outside a meta tag is not a declaration
    assert(m("""<p>charset=utf-8</p>""").isEmpty)
    // beyond the 1024-byte prescan budget: unseen
    assert(m(" " * 1100 + """<meta charset="utf-8">""").isEmpty)
  }

  test("detection precedence: BOM > header > meta > windows-1252 default") {
    val metaDoc = """<meta charset="utf-8">x""".getBytes("ISO-8859-1")
    // BOM beats a lying header
    val bomDoc = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ metaDoc
    assert(Charset.detect(bomDoc, "text/html; charset=windows-1252") == (("utf-8", "bom")))
    assert(Charset.detect(Array[Byte](0xff.toByte, 0xfe.toByte), null) == (("utf-16le", "bom")))
    assert(Charset.detect(Array[Byte](0xfe.toByte, 0xff.toByte), null) == (("utf-16be", "bom")))
    // header beats meta
    assert(Charset.detect(metaDoc, "text/html; charset=ISO-8859-1") == (("windows-1252", "header")))
    // meta when header is silent
    assert(Charset.detect(metaDoc, "text/html") == (("utf-8", "meta")))
    // a utf-16 label reached via the ASCII prescan is self-contradictory → utf-8
    assert(Charset.detect("""<meta charset="utf-16">x""".getBytes("ISO-8859-1"), null)
      == (("utf-8", "meta")))
    // nothing declared
    assert(Charset.detect("plain".getBytes("UTF-8"), "text/html") == (("windows-1252", "default")))
    assert(Charset.detect(null, null) == (("windows-1252", "default")))
  }

  test("decodeAs strips a matching BOM regardless of which tier chose the encoding") {
    assert(Charset.decodeAs("utf-8", bytes(0xef, 0xbb, 0xbf, 0x68, 0x69)) == "hi")
    assert(Charset.decodeAs("utf-16le", bytes(0xff, 0xfe, 0x68, 0x00)) == "h")
    assert(Charset.decodeAs("utf-16be", bytes(0xfe, 0xff, 0x00, 0x68)) == "h")
    assert(Charset.decodeAs("windows-1252", bytes(0x80)) == "€")
  }

  // ------------------------------------------------------------------
  // Fixture + operator end-to-end
  // ------------------------------------------------------------------

  test("fixture exercises every source tier and transcode round-trips the declared-correct combos") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Charset.transcode(Charset.encodeCharsetDocs(docs)).collect()
    assert(out.length == 200)
    val sources = out.map(_.source).toSet
    assert(sources == Set("bom", "header", "meta", "default"))
    assert(out.map(_.detected).toSet == Set("utf-8", "windows-1252", "utf-16le"))
    // every decoded body carries its ASCII id marker, whatever the charset path
    out.foreach(d => assert(d.text.contains(s"id:${d.doc_id}:"), d))
    // spot-check a mojibake hazard really occurs (utf-8 body read as cp1252)
    assert(out.exists(d => d.text.contains("Ã")), "expected at least one mojibake combo")
    // and a replacement hazard (cp1252 body read as utf-8)
    assert(out.exists(d => d.text.contains("�")), "expected at least one replacement combo")
  }

  test("charsetSignal checksum replays the transcode output bytes") {
    import spark.implicits._
    val docs = (0L until 32L).map(i => (i, "x")).toDF("doc_id", "text")
    val enc = Charset.encodeCharsetDocs(docs)
    val byId = Charset.transcode(enc).collect().map(d => d.doc_id -> d).toMap
    Charset.charsetSignal(enc).collect().foreach { s =>
      val t = byId(s.doc_id)
      val b = t.text.getBytes("UTF-8")
      var c = 0L
      b.foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
      assert(s.checksum == c && s.n_bytes_out == b.length.toLong &&
        s.detected == t.detected && s.source == t.source)
    }
  }
}
