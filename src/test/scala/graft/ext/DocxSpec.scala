package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DocxSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def model(id: Long, k: Int): (Long, Long) = {
    val text = Docx.paraText(id, k)
    val b = text.getBytes("UTF-8")
    var cs = 0L
    b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
    (b.length.toLong, cs)
  }

  test("round-trip: reader recovers the closed-form model across all writer arms") {
    for (id <- 0L until 64L) {
      val paras = Docx.parseDocx(id, Docx.renderDocx(id), 1 << 26)
      assert(paras.length == Docx.nParas(id), s"doc $id paragraph count")
      val expectedTitle = if (id % 7 == 3) "" else Docx.docTitle(id)
      paras.foreach { p =>
        val (nc, cs) = model(id, p.para_idx.toInt)
        assert(p.title == expectedTitle, s"doc $id title")
        assert(p.n_chars == nc && p.checksum == cs, s"doc $id para ${p.para_idx}")
      }
    }
  }

  test("xml:space semantics: preserve keeps edge whitespace, default trims") {
    val doc =
      """<?xml version="1.0"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        |  <w:body>
        |    <w:p>
        |      <w:r><w:t xml:space="preserve">  kept  </w:t></w:r>
        |      <w:r><w:t>
        |        trimmed
        |      </w:t></w:r>
        |      <w:r><w:t xml:space="default">  also trimmed  </w:t></w:r>
        |    </w:p>
        |  </w:body>
        |</w:document>
        |""".stripMargin
    assert(Docx.paragraphsOf(doc) == Vector("  kept  trimmedalso trimmed"))
    // an unknown xml:space value quarantines
    intercept[RuntimeException](Docx.paragraphsOf(doc.replace("\"default\"", "\"bogus\"")))
  }

  test("foreign producer: table-cell paragraphs, hyperlink runs, rsid noise, standalone tab run") {
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<w:body>
        |<w:p w:rsidR="00AB12CD" w:rsidRDefault="00AB12CD"><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Title &amp; intro</w:t></w:r></w:p>
        |<w:p><w:r><w:t>before</w:t></w:r><w:hyperlink r:id="rId9"><w:r><w:rPr><w:u w:val="single"/></w:rPr><w:t xml:space="preserve"> link </w:t></w:r></w:hyperlink><w:r><w:t>after</w:t></w:r></w:p>
        |<w:tbl><w:tblPr><w:tblW w:w="0" w:type="auto"/></w:tblPr>
        |<w:tr><w:tc><w:tcPr><w:tcW w:w="4788" w:type="dxa"/></w:tcPr><w:p><w:r><w:t>cell A</w:t></w:r></w:p></w:tc>
        |<w:tc><w:p><w:r><w:tab/></w:r><w:r><w:t>cell B</w:t></w:r></w:p></w:tc></w:tr>
        |</w:tbl>
        |<w:sectPr><w:pgSz w:w="11906" w:h="16838"/></w:sectPr>
        |</w:body>
        |</w:document>
        |""".stripMargin
    assert(Docx.paragraphsOf(doc) == Vector(
      "Title & intro", "before link after", "cell A", "\tcell B"))
  }

  test("OPC strictness: each violation quarantines the whole document") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def parse(b: Array[Byte]) =
      try Docx.parseDocx(1L, b, 1 << 26) catch { case scala.util.control.NonFatal(_) => Nil }
    def rebuild(id: Long)(f: Seq[(String, Array[Byte], Int)] => Seq[(String, Array[Byte], Int)]): Array[Byte] = {
      val entries = Zip.parseArchiveFiles(Docx.renderDocx(id), 1 << 26)
      Zip.buildZip(f(entries))
    }
    assert(parse(Docx.renderDocx(1L)).nonEmpty) // baseline sanity
    assert(parse("PKgarbage".getBytes(utf8)).isEmpty) // bad zip
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "[Content_Types].xml"))).isEmpty)
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "_rels/.rels"))).isEmpty)
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "word/document.xml"))).isEmpty)
    // no officeDocument relationship
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "_rels/.rels" =>
        (n, new String(d, utf8).replace("relationships/officeDocument",
          "relationships/officeDocumenX").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // TWO officeDocument relationships
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "_rels/.rels" =>
        (n, new String(d, utf8).replace("</Relationships>",
          """<Relationship Id="rIdX" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>""")
          .getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // path traversal in the target
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "_rels/.rels" =>
        (n, new String(d, utf8).replace("Target=\"word/document.xml\"",
          "Target=\"word/../document.xml\"").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // Content_Types lost the main-document Override
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "[Content_Types].xml" =>
        (n, new String(d, utf8).replace("wordprocessingml.document.main",
          "wordprocessingml.document.worng").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // XML damage in document.xml
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "word/document.xml" =>
        (n, new String(d, utf8).replace("</w:document>", "</w:documen>").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // declared core-properties part missing from the archive
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "docProps/core.xml"))).isEmpty)
    // truncated payload
    assert(parse(Docx.renderDocx(1L).take(80)).isEmpty)
  }

  test("relationships resolve by TYPE, not position (mod-3 reversed rels arm)") {
    val id = 3L // id % 3 == 0: relationship order reversed + styles rel added
    val rels = new String(
      Zip.parseArchiveFiles(Docx.renderDocx(id), 1 << 26)
        .find(_._1 == "_rels/.rels").get._2, "UTF-8")
    assert(rels.indexOf("relationships/styles") < rels.indexOf("officeDocument\""))
    assert(Docx.parseDocx(id, Docx.renderDocx(id), 1 << 26).nonEmpty)
  }

  test("operator: per-paragraph table, damage quarantines per document") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val rows = Docx.docxExtract(Docx.encodeDocx(docs)).collect()
    val expected = (0L until 24L).map(id => id -> Docx.nParas(id)).toMap
    assert(rows.groupBy(_.doc_id).view.mapValues(_.length).toMap == expected)
    val mixed = Docx.encodeDocx(docs.filter($"doc_id" < 2)).as[(Long, Array[Byte])]
      .map { case (id, p) => if (id == 0L) (id, p.take(50)) else (id, p) }
      .toDF("doc_id", "payload")
    val surviving = Docx.docxExtract(mixed).collect().map(_.doc_id).distinct
    assert(surviving.sameElements(Array(1L)))
  }
}
