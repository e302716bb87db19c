package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PptxSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def model(id: Long, j: Int): (Long, Long) = {
    val text = Pptx.slideText(id, j)
    val b = text.getBytes("UTF-8")
    var cs = 0L
    b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
    (b.length.toLong, cs)
  }

  test("round-trip: reader recovers the closed-form model across all writer arms") {
    for (id <- 0L until 64L) {
      val slides = Pptx.parsePptx(id, Pptx.renderPptx(id), 1 << 26)
      assert(slides.length == Pptx.nSlides(id), s"deck $id slide count")
      val expectedTitle = if (id % 7 == 2) "" else Pptx.deckTitle(id)
      slides.foreach { s =>
        val (nc, cs) = model(id, s.slide_idx.toInt)
        assert(s.title == expectedTitle, s"deck $id title")
        assert(s.n_chars == nc && s.checksum == cs, s"deck $id slide ${s.slide_idx}")
      }
    }
  }

  test("slide order follows sldIdLst r:ids, never filename or rels position") {
    // the writer stores slide j as slides/slide(nSlides-j).xml — if order
    // came from filenames the text would be reversed
    // pick a mod-3 deck (rels also reversed) with at least two slides
    val id = (0L until 30L by 3).find(i => Pptx.nSlides(i) >= 2).get
    val slides = Pptx.parsePptx(id, Pptx.renderPptx(id), 1 << 26)
    slides.foreach { s =>
      val (nc, cs) = model(id, s.slide_idx.toInt)
      assert(s.n_chars == nc && s.checksum == cs, s"slide ${s.slide_idx} out of order")
    }
  }

  test("a:t text is verbatim: the run-split arm's leading space survives") {
    val doc =
      """<?xml version="1.0"?>
        |<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
        |<p:cSld><p:spTree><p:sp><p:txBody>
        |<a:p><a:r><a:t>lead</a:t></a:r><a:r><a:t> tail </a:t></a:r></a:p>
        |<a:p><a:r><a:t>one</a:t></a:r><a:br/><a:r><a:t>two</a:t></a:r></a:p>
        |</p:txBody></p:sp>
        |<p:graphicFrame><a:tbl><a:tr><a:tc><a:txBody><a:p><a:r><a:t>cell</a:t></a:r></a:p></a:txBody></a:tc></a:tr></a:tbl></p:graphicFrame>
        |</p:spTree></p:cSld>
        |</p:sld>
        |""".stripMargin
    assert(Pptx.slideTextOf(doc) == "lead tail \none\ntwo\ncell")
  }

  test("OPC strictness: each violation quarantines the whole deck") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def parse(b: Array[Byte]) =
      try Pptx.parsePptx(1L, b, 1 << 26) catch { case scala.util.control.NonFatal(_) => Nil }
    def rebuild(id: Long)(f: Seq[(String, Array[Byte], Int)] => Seq[(String, Array[Byte], Int)]): Array[Byte] = {
      val entries = Zip.parseArchiveFiles(Pptx.renderPptx(id), 1 << 26)
      Zip.buildZip(f(entries))
    }
    assert(parse(Pptx.renderPptx(1L)).nonEmpty)
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "ppt/presentation.xml"))).isEmpty)
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "ppt/_rels/presentation.xml.rels"))).isEmpty)
    // a slide part missing
    assert(parse(rebuild(1L)(_.filterNot(_._1.startsWith("ppt/slides/slide1")))).isEmpty)
    // dangling sldId r:id
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "ppt/presentation.xml" =>
        (n, new String(d, utf8).replace("r:id=\"rSlide100\"",
          "r:id=\"rSlide999\"").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // Content_Types lost the presentation Override
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "[Content_Types].xml" =>
        (n, new String(d, utf8).replace("presentationml.presentation.main",
          "presentationml.presentation.wrong").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // XML damage in a slide
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n.startsWith("ppt/slides/") =>
        (n, new String(d, utf8).replace("</p:sld>", "</p:sl>").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    assert(parse(Pptx.renderPptx(1L).take(70)).isEmpty)
  }

  test("operator: per-slide table, damage quarantines per deck") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val rows = Pptx.pptxExtract(Pptx.encodePptx(docs)).collect()
    val expected = (0L until 24L).map(id => id -> Pptx.nSlides(id)).toMap
    assert(rows.groupBy(_.doc_id).view.mapValues(_.length).toMap == expected)
    val mixed = Pptx.encodePptx(docs.filter($"doc_id" < 2)).as[(Long, Array[Byte])]
      .map { case (id, p) => if (id == 1L) (id, p.take(90)) else (id, p) }
      .toDF("doc_id", "payload")
    assert(Pptx.pptxExtract(mixed).collect().map(_.doc_id).distinct.sameElements(Array(0L)))
  }
}
