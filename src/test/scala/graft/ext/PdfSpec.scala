package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PdfSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def utf8Model(id: Long, p: Int): (Long, Long, Long) = {
    val text = Pdf.pageText(id, p)
    val b = text.getBytes("UTF-8")
    var cs = 0L
    b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
    (Pdf.nLines(id, p).toLong, b.length.toLong, cs)
  }

  test("round-trip: reader recovers the closed-form text model across all writer arms") {
    for (id <- 0L until 64L) {
      val pages = Pdf.parsePdf(id, Pdf.renderPdf(id))
      val expectedPages = Pdf.basePages(id) + (if (id % 5 == 0) 1 else 0)
      assert(pages.length == expectedPages, s"doc $id page count")
      pages.foreach { pg =>
        val (nl, nc, cs) = utf8Model(id, pg.page_idx.toInt)
        assert(pg.n_lines == nl && pg.n_chars == nc && pg.checksum == cs,
          s"doc $id page ${pg.page_idx}")
      }
    }
  }

  test("extractText: line-break model, TJ kerning skip, hex strings, WinAnsi") {
    val content = ("BT /F1 12 Tf 14 TL 72 720 Td\n" +
      "(first) Tj ( line) Tj\n" + // two shows, same line
      "0 -14 Td (second) Tj\n" +
      "T* (third) Tj\n" +
      "[(ker) -250 (ned)] TJ\n" + // appends to third's line
      "<2048454C4C4F> Tj\n" + // " HELLO"
      "(tail) '\n" + // next-line show
      "1.5 0 (quoted) \"\n" + // spacing-operand next-line show
      "ET").getBytes("ISO-8859-1")
    val (text, n) = Pdf.extractText(content)
    assert(text == "first line\nsecond\nthirdkerned HELLO\ntail\nquoted")
    assert(n == 5)
    // WinAnsi high bytes through the shared cp1252 plane: 0xE9 -> é, 0x93 -> “
    val hi = "BT (café: ) Tj <93> Tj ET".getBytes("ISO-8859-1")
    assert(Pdf.extractText(hi)._1 == "café: “")
  }

  test("foreign producer: CRLF, comments, out-of-order objects, gen!=0, octal escapes," +
      " continuations, raw-EOL strings, odd hex, Contents array, multi-subsection xref") {
    val c1 = ("BT\r\n/F1 9 Tf\r\n20 TL\r\n100 700 Td\r\n" +
      "(Octal: \\101\\102\\103) Tj\r\n" + // octal escapes -> ABC
      "(, more) Tj\r\n" +
      "T*\r\n" +
      "(broken\\\r\nline) Tj\r\n" + // escaped-EOL continuation
      "0 -20 Td\r\n" +
      "(a\rb) Tj\r\n" + // raw CR inside literal -> \n in the text
      "ET").getBytes("ISO-8859-1")
    val c2 = ("BT\r\nT*\r\n(second ) Tj\r\n" +
      "[(ker) -250 (ned)] TJ\r\n" +
      "<2048454C4C4F> Tj\r\n" + // " HELLO"
      "(tail ) '\r\n" +
      "<4F6464 5> Tj\r\n" + // odd digit count: "Odd" + 0x50
      "ET").getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream
    def raw(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val off = scala.collection.mutable.Map[Int, Int]()
    raw("%PDF-1.6\r\n% hand-written by a different producer\r\n")
    off(6) = out.size // content 2 emitted FIRST (out of order)
    raw(s"6 0 obj\r\n<< /Length ${c2.length} >>\r\nstream\r\n")
    out.write(c2); raw("\r\nendstream endobj\r\n")
    raw("% a comment between objects\r\n")
    off(5) = out.size
    raw(s"5 0 obj\r\n<< /Length ${c1.length} >>\r\nstream\r\n")
    out.write(c1); raw("\r\nendstream endobj\r\n")
    off(4) = out.size
    raw("4 0 obj\r\n<< /Type /Page /Parent 3 0 R /Contents [ 5 0 R 6 0 R ] >>\r\nendobj\r\n")
    off(3) = out.size
    raw("3 0 obj\r\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\r\nendobj\r\n")
    off(2) = out.size
    raw("2 7 obj\r\n<< /Type /Catalog /Pages 3 0 R >>\r\nendobj\r\n")
    val x = out.size
    raw("xref\r\n0 1\r\n0000000000 65535 f \r\n")
    raw("2 2\r\n")
    raw(f"${off(2)}%010d 00007 n \r\n"); raw(f"${off(3)}%010d 00000 n \r\n")
    raw("4 3\r\n")
    raw(f"${off(4)}%010d 00000 n \r\n"); raw(f"${off(5)}%010d 00000 n \r\n")
    raw(f"${off(6)}%010d 00000 n \r\n")
    raw(s"trailer\r\n<< /Size 7 /Root 2 7 R >>\r\nstartxref\r\n$x\r\n%%EOF\r\n")

    val pages = Pdf.parsePdf(99L, out.toByteArray)
    assert(pages.length == 1)
    val expected = "Octal: ABC, more\nbrokenline\na\nb\nsecond kerned HELLO\ntail OddP"
    val b = expected.getBytes("UTF-8")
    var cs = 0L
    b.foreach(v => cs = (cs * 31 + (v & 0xff)) % 1000000007L)
    assert(pages.head.n_lines == 5 && pages.head.n_chars == b.length && pages.head.checksum == cs)
  }

  // one-subsection-per-object builder for the malformed table
  private def build(objs: Seq[(Int, String)], trailer: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def raw(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    raw("%PDF-1.4\n")
    val offs = objs.map { case (n, body) =>
      val o = out.size; raw(s"$n 0 obj\n$body\nendobj\n"); (n, o)
    }
    val x = out.size
    raw("xref\n0 1\n0000000000 65535 f \n")
    offs.foreach { case (n, o) => raw(s"$n 1\n"); raw(f"$o%010d 00000 n \n") }
    raw(s"trailer\n<< /Size ${objs.map(_._1).max + 1}$trailer >>\nstartxref\n$x\n%%EOF\n")
    out.toByteArray
  }

  test("malformed table: damage quarantines the whole document, never crashes") {
    val catalog = "<< /Type /Catalog /Pages 2 0 R >>"
    val bad: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "not a pdf at all".getBytes,
      "%PDF-1.4\nno startxref here".getBytes,
      "%PDF-1.4\nstartxref\n999999\n%%EOF\n".getBytes, // dangling xref offset
      build(Seq(1 -> catalog), " /Root 1 0 R"), // /Pages obj absent from the xref
      build(Seq(1 -> catalog,
        2 -> "<< /Type /Pages /Kids [2 0 R] /Count 1 >>"), " /Root 1 0 R"), // page-tree CYCLE
      build(Seq(1 -> catalog,
        2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4 -> "<< /Length 999 >>\nstream\nshort\nendstream"), " /Root 1 0 R"), // truncated stream
      build(Seq(1 -> catalog,
        2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3 -> "<< /Type /Page /Contents 4 0 R >>",
        4 -> "<< /Length 4 /Filter /FlateDecode >>\nstream\nXXXX\nendstream"),
        " /Root 1 0 R"), // broken Flate bytes
      build(Seq(2 -> "<< /Type /Pages /Kids [] /Count 0 >>"), ""), // no /Root anywhere
      { // xref entry pointing at an object with the WRONG number
        val base = build(Seq(1 -> catalog, 2 -> "<< /Type /Pages /Kids [] /Count 0 >>"),
          " /Root 1 0 R")
        val s = new String(base, "ISO-8859-1").replace("1 0 obj", "9 0 obj")
        s.getBytes("ISO-8859-1")
      })
    bad.zipWithIndex.foreach { case (payload, i) =>
      assert(Pdf.parsePdfSafe(42L, payload).isEmpty, s"malformed arm $i survived")
    }
    // a writer-emitted file with a flipped byte inside a Flate stream drops
    val good = Pdf.renderPdf(0L) // id 0: page 0 is the Flate arm
    val streamAt = new String(good, "ISO-8859-1").indexOf("stream\n", // first content stream
      new String(good, "ISO-8859-1").indexOf("/FlateDecode"))
    assert(streamAt > 0)
    val dam = good.clone()
    for (k <- 0 until 8) dam(streamAt + 10 + k) = (dam(streamAt + 10 + k) ^ 0x5a).toByte
    assert(Pdf.parsePdfSafe(0L, dam).isEmpty)
  }

  test("xref streams + object streams: modern-form arms and their damage ladder") {
    // odd ids write the PDF 1.5 form; odd multiples of 5 are HYBRID chains
    // (classic update over a modern base) — both covered by the roundtrip
    // test; here pin the form actually in the bytes, then the damage arms
    val modern = Pdf.renderPdf(7L)
    val s = new String(modern, "ISO-8859-1")
    assert(s.contains("/Type /ObjStm") && s.contains("/Type /XRef"))
    assert(!s.contains("trailer"), "the xref stream's dict IS the trailer")
    assert(Pdf.parsePdfSafe(7L, modern).nonEmpty)
    val hybrid = Pdf.renderPdf(5L)
    val hs = new String(hybrid, "ISO-8859-1")
    assert(hs.contains("/Type /XRef") && hs.contains("trailer") && hs.contains("/Prev"))
    assert(Pdf.parsePdfSafe(5L, hybrid).nonEmpty)
    // damage inside the object stream's Flate bytes -> whole doc drops
    val osAt = s.indexOf("stream\n", s.indexOf("/Type /ObjStm"))
    val d1 = modern.clone()
    for (k <- 0 until 6) d1(osAt + 8 + k) = (d1(osAt + 8 + k) ^ 0x33).toByte
    assert(Pdf.parsePdfSafe(7L, d1).isEmpty)
    // damage inside the xref stream's Flate bytes -> whole doc drops
    val xrAt = s.indexOf("stream\n", s.indexOf("/Type /XRef"))
    val d2 = modern.clone()
    for (k <- 0 until 6) d2(xrAt + 8 + k) = (d2(xrAt + 8 + k) ^ 0x55).toByte
    assert(Pdf.parsePdfSafe(7L, d2).isEmpty)
    // /W widths vandalized (3 -> 9 exceeds the 4-byte field cap)
    val d3 = new String(modern, "ISO-8859-1").replace("/W [1 3 1]", "/W [1 9 1]")
    assert(Pdf.parsePdfSafe(7L, d3.getBytes("ISO-8859-1")).isEmpty)
  }

  test("CID fonts: ToUnicode CMap parse, Tf-switched decode, strict unmapped quarantine") {
    // parseCMap: bfchar singles + an incrementing bfrange, wrapper skipped
    val cmap = Pdf.parseCMap(
      ("""/CIDInit /ProcSet findresource begin
         |begincmap
         |2 beginbfchar
         |<0001> <00e9>
         |<0007> <0041>
         |endbfchar
         |1 beginbfrange
         |<0100> <0102> <0061>
         |endbfrange
         |endcmap end
         |""".stripMargin).getBytes("ISO-8859-1"))
    assert(cmap == Map(1 -> "\u00e9", 7 -> "A", 0x100 -> "a", 0x101 -> "b", 0x102 -> "c"))
    // Tf switches decode mid-stream: same bytes, two fonts, two meanings
    val content = ("BT /F1 12 Tf (AB) Tj /FX 12 Tf " +
      "<00010100> Tj ET").getBytes("ISO-8859-1")
    val fonts = Map[String, Pdf.FontDecode](
      "F1" -> Pdf.WinAnsiFont, "FX" -> Pdf.CidMapped(cmap))
    assert(Pdf.extractText(content, fonts)._1 == "AB\u00e9a")
    // unmapped CID and odd-length CID strings quarantine
    intercept[RuntimeException](Pdf.extractText(
      "BT /FX 12 Tf <0099> Tj ET".getBytes("ISO-8859-1"), fonts))
    intercept[RuntimeException](Pdf.extractText(
      "BT /FX 12 Tf <000101> Tj ET".getBytes("ISO-8859-1"), fonts))
    // a SIMPLE font with a ToUnicode CMap decodes 1-byte codes through it
    // (the pdflatex shape); a Type0 WITHOUT ToUnicode quarantines at show
    val simple = Map[String, Pdf.FontDecode](
      "FS" -> Pdf.SimpleMapped(Map('A'.toInt -> "x", 'B'.toInt -> "yz")),
      "F0" -> Pdf.CidUnmapped)
    assert(Pdf.extractText("BT /FS 12 Tf (AB) Tj ET".getBytes("ISO-8859-1"), simple)._1 == "xyz")
    intercept[RuntimeException](Pdf.extractText(
      "BT /FS 12 Tf (AC) Tj ET".getBytes("ISO-8859-1"), simple)) // unmapped byte
    intercept[RuntimeException](Pdf.extractText(
      "BT /F0 12 Tf <0001> Tj ET".getBytes("ISO-8859-1"), simple))
    // the fixture's mapping is NON-identity: stripping /ToUnicode from a
    // CID page's font makes extraction produce different bytes (an
    // extractor that ignores the CMap cannot pass the oracle)
    val id = 2L // (2 + 0) % 4 == 2: page 0 is a CID page
    assert(Pdf.cidPage(id, 0))
    val good = Pdf.renderPdf(id)
    val stripped = new String(good, "ISO-8859-1")
      .replace("/ToUnicode 5 0 R", "                ") // same length: offsets survive
    val viaCmap = Pdf.parsePdfSafe(id, good)
    val without = Pdf.parsePdfSafe(id, stripped.getBytes("ISO-8859-1"))
    assert(viaCmap.nonEmpty)
    assert(without.isEmpty || without.head.checksum != viaCmap.head.checksum,
      "skipping the CMap must not reproduce the oracle text")
  }

  test("filters: ASCIIHex/ASCII85 units, LZW EarlyChange toggle, the new writer arms") {
    // ASCIIHex: whitespace skipped, odd final digit pads a low 0, EOD required
    assert(Pdf.asciiHexDecode("48 65\n6C6C 6F2>".getBytes("ISO-8859-1"))
      .sameElements("Hello ".getBytes("ISO-8859-1")))
    intercept[RuntimeException](Pdf.asciiHexDecode("4865".getBytes("ISO-8859-1"))) // no EOD
    intercept[RuntimeException](Pdf.asciiHexDecode("4G>".getBytes("ISO-8859-1")))
    val data = {
      // LCG bytes: enough distinct pairs that LZW crosses the 9→10→11
      // width bumps, where the EarlyChange convention actually matters
      var x = 12345L
      Array.fill[Byte](5000) { x = (x * 1103515245L + 12345L) & 0x7fffffffL; (x >> 16).toByte }
    }
    assert(Pdf.asciiHexDecode(Pdf.asciiHexEncode(data)).sameElements(data))
    // ASCII85: z shorthand, partial groups, wrap/ws, EOD, overflow guard
    assert(Pdf.ascii85Decode(Pdf.ascii85Encode(data)).sameElements(data))
    val zeros = new Array[Byte](12)
    assert(new String(Pdf.ascii85Encode(zeros), "ISO-8859-1") == "zzz~>")
    assert(Pdf.ascii85Decode(Pdf.ascii85Encode(zeros)).sameElements(zeros))
    assert(Pdf.ascii85Decode(Pdf.ascii85Encode(Array[Byte](65))).sameElements(Array[Byte](65)))
    intercept[RuntimeException](Pdf.ascii85Decode("abcd".getBytes("ISO-8859-1"))) // no EOD
    intercept[RuntimeException](Pdf.ascii85Decode("uuuuu~>".getBytes("ISO-8859-1"))) // > 2^32-1
    // LZW, early change (the PDF default == the TIFF kernel convention)
    val lz = Tiff.lzwEncode(data)
    assert(Pdf.lzwDecode(lz, 1 << 20, earlyChange = true).sameElements(data))
    // decoding the same bytes under the WRONG convention must not
    // silently reproduce the input
    val wrong = try Some(Pdf.lzwDecode(lz, 1 << 20, earlyChange = false))
      catch { case _: RuntimeException => None }
    assert(wrong.forall(!_.sameElements(data)))
    // a late-change (EarlyChange 0) producer: encoder bumps one entry
    // past the decoder's exact table-full point
    def lzwEncodeLate(src: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(src.length / 2 + 16)
      var acc = 0L; var nb = 0
      def put(code: Int, width: Int): Unit = {
        acc = (acc << width) | code; nb += width
        while (nb >= 8) { out.write(((acc >> (nb - 8)) & 0xff).toInt); nb -= 8 }
      }
      val dict = new java.util.HashMap[Long, Integer](8192)
      var width = 9; var next = 258
      put(256, width)
      var prev = -1; var i = 0
      while (i < src.length) {
        val b = src(i) & 0xff
        if (prev < 0) prev = b
        else {
          val key = (prev.toLong << 8) | b
          val hit = dict.get(key)
          if (hit != null) prev = hit.intValue()
          else {
            put(prev, width)
            if (next < 4094) {
              dict.put(key, Integer.valueOf(next)); next += 1
              if (next == (1 << width) + 1 && width < 12) width += 1
            } else { put(256, width); dict.clear(); width = 9; next = 258 }
            prev = b
          }
        }
        i += 1
      }
      if (prev >= 0) put(prev, width)
      put(257, width)
      if (nb > 0) out.write(((acc << (8 - nb)) & 0xff).toInt)
      out.toByteArray
    }
    assert(Pdf.lzwDecode(lzwEncodeLate(data), 1 << 20, earlyChange = false).sameElements(data))
    // the fixture arms actually exercise the filters end to end
    val withLzw = new String(Pdf.renderPdf(3L), "ISO-8859-1") // (3+0)%6==3: LZW page
    assert(withLzw.contains("/LZWDecode"))
    assert(withLzw.contains("/Filter /ASCIIHexDecode")) // odd id: hex CMap arm
    val withChain = new String(Pdf.renderPdf(5L), "ISO-8859-1") // (5+0)%6==5: chain page
    assert(withChain.contains("[/ASCII85Decode /FlateDecode]"))
    // a stale /DecodeParms on an UNFILTERED stream is spec-tolerable and
    // must parse (review-pass regression), not quarantine
    val stale = build(Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Contents 4 0 R >>",
      4 -> ("<< /Length 22 /DecodeParms << /Predictor 1 >> >>\n" +
        "stream\nBT (stale parms) Tj ET\nendstream")), " /Root 1 0 R")
    val stalePages = Pdf.parsePdfSafe(55L, stale)
    assert(stalePages.length == 1 &&
      stalePages.head.n_chars == "stale parms".getBytes("UTF-8").length)
  }

  test("/Differences encoding: non-identity remap; stripping the array changes the text") {
    val id = 4L // (4+0)%4 == 0: page 0 shows through /F3
    assert(Pdf.diffPage(id, 0))
    val good = Pdf.renderPdf(id)
    val viaDiff = Pdf.parsePdfSafe(id, good)
    assert(viaDiff.nonEmpty)
    val (nl, nc, cs) = utf8Model(id, 0)
    assert(viaDiff.head.n_lines == nl && viaDiff.head.n_chars == nc && viaDiff.head.checksum == cs)
    val s = new String(good, "ISO-8859-1")
    val target = "/Differences [97 /b 98 /a 128 /eacute /quotedblleft /quotedblright]"
    assert(s.contains(target))
    // same-length blank keeps every offset; the font falls back to plain
    // WinAnsi, so the swapped a/b codes and the 128..130 high chars now
    // decode differently — an extractor ignoring /Differences cannot pass
    val stripped = Pdf.parsePdfSafe(id, s.replace(target, " " * target.length).getBytes("ISO-8859-1"))
    assert(stripped.isEmpty || stripped.head.checksum != viaDiff.head.checksum)
  }

  test("Tf naming a font absent from a NON-EMPTY resource map quarantines at show") {
    val fonts = Map[String, Pdf.FontDecode]("F1" -> Pdf.WinAnsiFont)
    intercept[RuntimeException](
      Pdf.extractText("BT /F9 12 Tf (x) Tj ET".getBytes("ISO-8859-1"), fonts))
    // a dangling Tf with no subsequent show is harmless
    assert(Pdf.extractText("BT /F9 12 Tf ET".getBytes("ISO-8859-1"), fonts)._1 == "")
    // with NO declared fonts the classic WinAnsi default still applies
    assert(Pdf.extractText("BT /F9 12 Tf (ok) Tj ET".getBytes("ISO-8859-1"))._1 == "ok")
  }

  test("trailing junk after %%EOF: tolerated to 1024 bytes, quarantined past it") {
    val good = Pdf.renderPdf(1L)
    val junk = ("\n% appended by a truncating proxy\n" + "#" * 500).getBytes("ISO-8859-1")
    val padded = good ++ junk
    assert(Pdf.parsePdfSafe(1L, padded).map(_.checksum) == Pdf.parsePdfSafe(1L, good).map(_.checksum))
    assert(Pdf.parsePdfSafe(1L, padded).nonEmpty)
    val far = good ++ ("#" * 2000).getBytes("ISO-8859-1")
    assert(Pdf.parsePdfSafe(1L, far).isEmpty)
  }

  test("foreign producer, PDF 1.5: xref stream with /W [2 4 2], multi-subsection /Index," +
      " Predictor 12, ObjStm, java.util.zip Flate") {
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val content = "BT 72 720 Td (Foreign xref stream) Tj ET".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream
    def raw(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    raw("%PDF-1.5\r\n%Âµ\r\n")
    // ObjStm packs catalog (1), pages (2), page (4): the numbering gaps
    // force a multi-subsection /Index; foreign style writes no spaces
    val b1 = "<</Type/Catalog/Pages 2 0 R>>"
    val b2 = "<</Type/Pages/Kids[4 0 R]/Count 1>>"
    val b4 = "<</Type/Page/Parent 2 0 R/Contents 5 0 R>>"
    val o2 = b1.length + 1
    val o4 = o2 + b2.length + 1
    val header = s"1 0 2 $o2 4 $o4 "
    val stmZ = deflate((header + b1 + "\n" + b2 + "\n" + b4 + "\n").getBytes("ISO-8859-1"))
    val off7 = out.size
    raw(s"7 0 obj\r\n<</Type/ObjStm/N 3/First ${header.length}/Filter/FlateDecode" +
      s"/Length ${stmZ.length}>>\r\nstream\r\n")
    out.write(stmZ); raw("\r\nendstream\r\nendobj\r\n")
    val off5 = out.size
    raw(s"5 0 obj\r\n<</Length ${content.length}>>\r\nstream\r\n")
    out.write(content); raw("\r\nendstream\r\nendobj\r\n")
    val off9 = out.size
    val rowLen = 8 // /W [2 4 2]
    def row(t: Int, f2: Long, f3: Int): Array[Byte] = Array(
      ((t >> 8) & 0xff).toByte, (t & 0xff).toByte,
      ((f2 >> 24) & 0xff).toByte, ((f2 >> 16) & 0xff).toByte,
      ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
      ((f3 >> 8) & 0xff).toByte, (f3 & 0xff).toByte)
    val rows: Array[Array[Byte]] = Array(
      row(2, 7, 0), row(2, 7, 1), // objects 1, 2
      row(2, 7, 2), row(1, off5, 0), // objects 4, 5
      row(1, off7, 0), // object 7
      row(1, off9, 0)) // object 9 (the xref stream itself)
    val filtered = new java.io.ByteArrayOutputStream
    var prevRow = new Array[Byte](rowLen)
    rows.foreach { r =>
      filtered.write(2) // PNG filter: Up
      (0 until rowLen).foreach(j => filtered.write(((r(j) & 0xff) - (prevRow(j) & 0xff)) & 0xff))
      prevRow = r
    }
    val xz = deflate(filtered.toByteArray)
    raw(s"9 0 obj\r\n<</Type/XRef/Size 10/W[2 4 2]/Index[1 2 4 2 7 1 9 1]/Root 1 0 R" +
      s"/DecodeParms<</Predictor 12/Columns $rowLen>>/Filter/FlateDecode" +
      s"/Length ${xz.length}>>\r\nstream\r\n")
    out.write(xz); raw("\r\nendstream\r\nendobj\r\n")
    raw(s"startxref\r\n$off9\r\n%%EOF")
    val pages = Pdf.parsePdf(123L, out.toByteArray)
    assert(pages.length == 1)
    val expected = "Foreign xref stream".getBytes("UTF-8")
    var cs = 0L
    expected.foreach(v => cs = (cs * 31 + (v & 0xff)) % 1000000007L)
    assert(pages.head.n_lines == 1 && pages.head.n_chars == expected.length &&
      pages.head.checksum == cs)
  }

  test("RC4 core matches the published test vectors") {
    def hex(b: Array[Byte]) = b.map("%02X".format(_)).mkString
    assert(hex(Pdf.rc4("Key".getBytes("US-ASCII"), "Plaintext".getBytes("US-ASCII"))) ==
      "BBF316E8D940AF0AD3")
    assert(hex(Pdf.rc4("Wiki".getBytes("US-ASCII"), "pedia".getBytes("US-ASCII"))) ==
      "1021BF0420")
    // decryption is the same operation
    val ct = Pdf.rc4("Key".getBytes("US-ASCII"), "Plaintext".getBytes("US-ASCII"))
    assert(new String(Pdf.rc4("Key".getBytes("US-ASCII"), ct), "US-ASCII") == "Plaintext")
  }

  test("encryption arm: ciphertext on the wire, transparent text recovery, R2 and R3") {
    // id 1: modern form, R2/40-bit; id 4: classic, R3/128; id 10: classic,
    // R3, PLUS an incremental update whose trailer must repeat /Encrypt
    for (id <- Seq(1L, 4L, 7L, 10L, 25L)) {
      val bytes = Pdf.renderPdf(id)
      val wire = new String(bytes, "ISO-8859-1")
      assert(wire.contains("/Encrypt 7 0 R"), s"doc $id carries the trailer entry")
      // no cleartext content sneaks through: the raw-filter arm pages would
      // otherwise show literal fixture text
      assert(!wire.contains("Line 0 of page"), s"doc $id content is ciphertext")
      val pages = Pdf.parsePdf(id, bytes)
      assert(pages.length == Pdf.basePages(id) + (if (id % 5 == 0) 1 else 0))
      pages.foreach { pg =>
        val (nl, nc, cs) = utf8Model(id, pg.page_idx.toInt)
        assert(pg.n_lines == nl && pg.n_chars == nc && pg.checksum == cs,
          s"doc $id page ${pg.page_idx}")
      }
    }
    // an unencrypted raw-arm doc DOES carry cleartext (the assertion above
    // is meaningful): id 3 has a raw content stream on page 0 ((3+0)%6==3 is
    // LZW — use id 0 page 1: (0+1)%6==1 raw)
    assert(new String(Pdf.renderPdf(0L), "ISO-8859-1").contains("Line 0 of page"))
    // the old-Acrobat /V 1 /R 3 40-bit shape (id 16): declared without a
    // /Length entry, still decodes — the review-pass regression pin
    val v1r3 = Pdf.renderPdf(16L)
    val v1r3Wire = new String(v1r3, "ISO-8859-1")
    assert(v1r3Wire.contains("/V 1 /R 3") && !v1r3Wire.contains("/Length 40"),
      "id 16 is the V1/R3 arm")
    assert(Pdf.parsePdf(16L, v1r3).nonEmpty, "V1/R3 decodes")
  }

  test("encryption: tampered /U, AES /V, and a missing /ID all quarantine") {
    def mutate(id: Long, from: String, to: String): Array[Byte] = {
      require(from.length == to.length) // offsets must survive the surgery
      val s = new String(Pdf.renderPdf(id), "ISO-8859-1")
      assert(s.contains(from), s"doc $id wire carries $from")
      s.replace(from, to).getBytes("ISO-8859-1")
    }
    for (id <- Seq(1L, 4L)) { // one modern/R2, one classic/R3
      val wire = new String(Pdf.renderPdf(id), "ISO-8859-1")
      val ui = wire.indexOf("/U <")
      assert(ui > 0)
      val uHex = wire.substring(ui + 4, ui + 4 + 64)
      val flipped = (if (uHex.head == '0') "1" else "0") + uHex.tail
      assert(Pdf.parsePdfSafe(id, mutate(id, "/U <" + uHex, "/U <" + flipped)).isEmpty,
        s"doc $id tampered /U")
      val vDecl = if (id == 1L) "/V 1" else "/V 2"
      assert(Pdf.parsePdfSafe(id, mutate(id, vDecl, "/V 4")).isEmpty, s"doc $id AES /V")
      assert(Pdf.parsePdfSafe(id, mutate(id, "/ID [", "/XD [")).isEmpty, s"doc $id no /ID")
    }
    // sanity: the untampered docs extract
    assert(Pdf.parsePdfSafe(1L, Pdf.renderPdf(1L)).nonEmpty)
    assert(Pdf.parsePdfSafe(4L, Pdf.renderPdf(4L)).nonEmpty)
  }

  test("AES handlers: AESV2 and AESV3 arms decode; every check value is load-bearing") {
    // id 7: classic form, R4 /AESV2; id 10: classic + incremental update,
    // R6 /AESV3; id 19: modern (xref-stream) form, R4; id 22: modern, R6
    for (id <- Seq(7L, 10L, 19L, 22L)) {
      val bytes = Pdf.renderPdf(id)
      val wire = new String(bytes, "ISO-8859-1")
      val expCfm = if ((id / 3) % 4 == 2) "/CFM /AESV2" else "/CFM /AESV3"
      assert(wire.contains(expCfm), s"doc $id declares $expCfm")
      assert(!wire.contains("Line 0 of page"), s"doc $id content is ciphertext")
      val pages = Pdf.parsePdf(id, bytes)
      assert(pages.length == Pdf.basePages(id) + (if (id % 5 == 0) 1 else 0))
      pages.foreach { pg =>
        val (nl, nc, cs) = utf8Model(id, pg.page_idx.toInt)
        assert(pg.n_lines == nl && pg.n_chars == nc && pg.checksum == cs,
          s"doc $id page ${pg.page_idx}")
      }
    }
    def mutate(id: Long, from: String, to: String): Array[Byte] = {
      require(from.length == to.length)
      val s = new String(Pdf.renderPdf(id), "ISO-8859-1")
      assert(s.contains(from), s"doc $id wire carries $from")
      s.replace(from, to).getBytes("ISO-8859-1")
    }
    def flipHexAfter(id: Long, tag: String, hexLen: Int): Array[Byte] = {
      val wire = new String(Pdf.renderPdf(id), "ISO-8859-1")
      val at = wire.indexOf(tag)
      assert(at > 0, s"doc $id carries $tag")
      val hx = wire.substring(at + tag.length, at + tag.length + hexLen)
      val flipped = (if (hx.head == '0') "1" else "0") + hx.tail
      mutate(id, tag + hx, tag + flipped)
    }
    // R4: a tampered /U fails Algorithm 5; a non-AESV2 crypt filter or an
    // Identity default quarantines before any decrypt
    assert(Pdf.parsePdfSafe(7L, flipHexAfter(7L, "/U <", 64)).isEmpty, "R4 tampered /U")
    assert(Pdf.parsePdfSafe(7L, mutate(7L, "/CFM /AESV2", "/CFM /AESV9")).isEmpty)
    assert(Pdf.parsePdfSafe(7L, mutate(7L, "/StmF /StdCF", "/StmF /StdCX")).isEmpty)
    // R6: a tampered /U fails the 2.B validation hash; a tampered /UE
    // unwraps a wrong key that /Perms then refuses; tampered /Perms
    // fails the adb magic; a wrong /P fails the echo
    assert(Pdf.parsePdfSafe(10L, flipHexAfter(10L, "/U <", 96)).isEmpty, "R6 tampered /U")
    assert(Pdf.parsePdfSafe(10L, flipHexAfter(10L, "/UE <", 64)).isEmpty, "R6 tampered /UE")
    assert(Pdf.parsePdfSafe(10L, flipHexAfter(10L, "/Perms <", 32)).isEmpty, "R6 tampered /Perms")
    assert(Pdf.parsePdfSafe(10L, mutate(10L, "/P -44 >>", "/P -45 >>")).isEmpty, "R6 /P echo")
    // sanity: untampered AES docs extract
    assert(Pdf.parsePdfSafe(7L, Pdf.renderPdf(7L)).nonEmpty)
    assert(Pdf.parsePdfSafe(10L, Pdf.renderPdf(10L)).nonEmpty)
  }

  test("hostile /Length: a 2 GB declaration drops without allocating") {
    val bomb = build(Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Contents 4 0 R >>",
      4 -> "<< /Length 2000000000 >>\nstream\ntiny\nendstream"), " /Root 1 0 R")
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val before = tmx.getThreadAllocatedBytes(tid)
    (0 until 16).foreach(_ => assert(Pdf.parsePdfSafe(7L, bomb).isEmpty))
    val allocated = tmx.getThreadAllocatedBytes(tid) - before
    assert(allocated < (8L << 20), s"allocated $allocated bytes across 16 bomb parses")
  }

  test("operator: per-page table over the fixture, damage quarantines per doc") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val rows = Pdf.pdfExtract(Pdf.encodePdf(docs)).collect()
    val expected = (0L until 24L).map(id =>
      id -> (Pdf.basePages(id) + (if (id % 5 == 0) 1 else 0))).toMap
    assert(rows.groupBy(_.doc_id).view.mapValues(_.length).toMap == expected)
    // poison one doc, keep another: quarantine is per document
    val mixed = Pdf.encodePdf(docs.filter($"doc_id" < 2)).as[(Long, Array[Byte])]
      .map { case (id, p) => if (id == 0L) (id, p.take(40)) else (id, p) }
      .toDF("doc_id", "payload")
    val surviving = Pdf.pdfExtract(mixed).collect().map(_.doc_id).distinct
    assert(surviving.sameElements(Array(1L)))
  }
}
