package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class OdtSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def model(id: Long, k: Int): (Long, Long) = {
    val text = Odt.paraText(id, k)
    val b = text.getBytes("UTF-8")
    var cs = 0L
    b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
    (b.length.toLong, cs)
  }

  test("round-trip: reader recovers the closed-form model across all writer arms") {
    for (id <- 0L until 64L) {
      val paras = Odt.parseOdt(id, Odt.renderOdt(id), 1 << 26)
      assert(paras.length == Odt.nParas(id), s"doc $id paragraph count")
      val expectedTitle = if (id % 7 == 5) "" else Odt.docTitle(id)
      paras.foreach { p =>
        val (nc, cs) = model(id, p.para_idx.toInt)
        assert(p.title == expectedTitle, s"doc $id title")
        assert(p.n_chars == nc && p.checksum == cs, s"doc $id para ${p.para_idx}")
      }
    }
  }

  test("mixed content + whitespace profile: spans, collapse, text:s counts, tabs, breaks") {
    val doc =
      """<?xml version="1.0"?>
        |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
        |<office:body><office:text>
        |<text:p>Hello <text:span text:style-name="T1">bold</text:span> world</text:p>
        |<text:p>runs
        |   collapse</text:p>
        |<text:p>a<text:s text:c="3"/>b<text:s/>c<text:tab/>d<text:line-break/>e</text:p>
        |<text:h text:outline-level="1">A heading</text:h>
        |<text:p>link to <text:a xlink:href="http://example.com/x">a page</text:a>.</text:p>
        |</office:text></office:body>
        |</office:document-content>
        |""".stripMargin
    assert(Odt.paragraphsOf(doc) == Vector(
      "Hello bold world",
      "runs collapse",
      "a   b c\td\ne",
      "A heading",
      "link to a page."))
    // out-of-profile structures INSIDE a paragraph quarantine instead of
    // merging wrong text (the review-pass regression): footnote bodies
    // nest text:p, citation numbers are not paragraph content
    val footnote = doc.replace("<text:p>Hello <text:span text:style-name=\"T1\">bold</text:span> world</text:p>",
      "<text:p>body<text:note text:note-class=\"footnote\">" +
        "<text:note-citation>1</text:note-citation>" +
        "<text:note-body><text:p>note text</text:p></text:note-body>" +
        "</text:note> tail</text:p>")
    intercept[RuntimeException](Odt.paragraphsOf(footnote))
  }

  test("ODF strictness: each package violation quarantines the whole document") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def parse(b: Array[Byte]) =
      try Odt.parseOdt(1L, b, 1 << 26) catch { case scala.util.control.NonFatal(_) => Nil }
    def rebuild(id: Long)(f: Seq[(String, Array[Byte], Int)] => Seq[(String, Array[Byte], Int)]): Array[Byte] = {
      val entries = Zip.parseArchiveFiles(Odt.renderOdt(id), 1 << 26)
      Zip.buildZip(f(entries))
    }
    assert(parse(Odt.renderOdt(1L)).nonEmpty) // baseline sanity
    // mimetype not physically first
    assert(parse(rebuild(1L)(es => es.tail :+ es.head)).isEmpty)
    // mimetype compressed
    assert(parse(rebuild(1L)(es => es.updated(0, (es.head._1, es.head._2, 8)))).isEmpty)
    // wrong media type
    assert(parse(rebuild(1L)(es => es.updated(0,
      ("mimetype", "application/vnd.oasis.opendocument.spreadsheet".getBytes(utf8), 0)))).isEmpty)
    // manifest missing
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "META-INF/manifest.xml"))).isEmpty)
    // a listed part missing from the archive
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "styles.xml"))).isEmpty)
    // content.xml not listed in the manifest
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "META-INF/manifest.xml" =>
        (n, new String(d, utf8).replace("manifest:full-path=\"content.xml\"",
          "manifest:full-path=\"content2.xml\"").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // no package-root manifest entry
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "META-INF/manifest.xml" =>
        (n, new String(d, utf8).replace("manifest:full-path=\"/\"",
          "manifest:full-path=\"//\"").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // XML damage in content.xml
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "content.xml" =>
        (n, new String(d, utf8).replace("</office:document-content>",
          "</office:document-conten>").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // truncation
    assert(parse(Odt.renderOdt(1L).take(60)).isEmpty)
  }

  test("operator: per-paragraph table, damage quarantines per document") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val rows = Odt.odtExtract(Odt.encodeOdt(docs)).collect()
    val expected = (0L until 24L).map(id => id -> Odt.nParas(id)).toMap
    assert(rows.groupBy(_.doc_id).view.mapValues(_.length).toMap == expected)
    val mixed = Odt.encodeOdt(docs.filter($"doc_id" < 2)).as[(Long, Array[Byte])]
      .map { case (id, p) => if (id == 0L) (id, p.take(50)) else (id, p) }
      .toDF("doc_id", "payload")
    assert(Odt.odtExtract(mixed).collect().map(_.doc_id).distinct.sameElements(Array(1L)))
  }
}
