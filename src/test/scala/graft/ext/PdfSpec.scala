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
