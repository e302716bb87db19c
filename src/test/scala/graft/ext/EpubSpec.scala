package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EpubSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def model(id: Long, k: Int): (Long, Long) = {
    val b = Epub.chapterText(id, k).getBytes("UTF-8")
    var cs = 0L
    b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
    (b.length.toLong, cs)
  }

  test("round-trip: spine-ordered chapters recover the closed-form text model") {
    for (id <- 0L until 48L) {
      val chapters = Epub.parseEpub(id, Epub.renderEpub(id), 1 << 26)
      assert(chapters.length == Epub.nChapters(id), s"book $id chapter count")
      chapters.foreach { ch =>
        val (nc, cs) = model(id, ch.chapter_idx.toInt)
        assert(ch.title == Epub.bookTitle(id), s"book $id title")
        assert(ch.n_chars == nc && ch.checksum == cs, s"book $id ch ${ch.chapter_idx}")
      }
    }
  }

  test("reading order follows the spine, not the manifest (mod-3 reversed manifest)") {
    // id 3: manifest emitted REVERSED; chapters must still come back 0..n-1
    val id = 3L
    assert(id % 3 == 0 && Epub.nChapters(id) >= 2)
    val chapters = Epub.parseEpub(id, Epub.renderEpub(id), 1 << 26)
    assert(chapters.map(_.chapter_idx) == (0 until Epub.nChapters(id)).map(_.toLong))
    chapters.foreach { ch =>
      assert(ch.checksum == model(id, ch.chapter_idx.toInt)._2)
    }
  }

  test("groupAttrs: marker-delimited, order-robust, no cross-element merging") {
    val leaves = Vector(
      "p/m/item@<" -> "", "p/m/item@id" -> "a", "p/m/item@href" -> "1",
      "p/m/item@<" -> "", "p/m/item@href" -> "2", "p/m/item@id" -> "b", // foreign attr order
      "p/m/item@<" -> "", "p/m/item@id" -> "c", // attr missing: stays its own group
      "other/leaf" -> "x")
    assert(Epub.groupAttrs(leaves, "p/m/item") == Vector(
      Map("id" -> "a", "href" -> "1"), Map("href" -> "2", "id" -> "b"), Map("id" -> "c")))
    // a manifest item missing href must QUARANTINE the book, not borrow
    // its neighbor's href (the silent cross-wiring the markers prevent)
    val opf =
      """<?xml version="1.0"?>
        |<package xmlns="x">
        |  <metadata><dc:title>t</dc:title></metadata>
        |  <manifest>
        |    <item id="a"/>
        |    <item href="ch0.xhtml" id="b" media-type="application/xhtml+xml"/>
        |  </manifest>
        |  <spine><itemref idref="a"/></spine>
        |</package>""".stripMargin
    val groups = Epub.groupAttrs(
      Sitemaps.parseLeaves(opf, withAttrs = true, withMarkers = true), "package/manifest/item")
    assert(groups == Vector(
      Map("id" -> "a"), Map("href" -> "ch0.xhtml", "id" -> "b", "media-type" -> "application/xhtml+xml")))
  }

  private def rebuild(id: Long)(f: Seq[(String, Array[Byte], Int)] => Seq[(String, Array[Byte], Int)]): Array[Byte] = {
    val entries = Zip.parseArchiveFiles(Epub.renderEpub(id), 1 << 26)
    Zip.buildZip(f(entries))
  }

  test("OCF strictness: each violation quarantines the whole book") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def parse(b: Array[Byte]) =
      try Epub.parseEpub(1L, b, 1 << 26) catch { case scala.util.control.NonFatal(_) => Nil }
    assert(parse(Epub.renderEpub(1L)).nonEmpty) // baseline sanity
    // mimetype not first
    assert(parse(rebuild(1L)(es => es.tail :+ es.head)).isEmpty)
    // mimetype compressed instead of stored
    assert(parse(rebuild(1L)(es => es.updated(0, (es.head._1, es.head._2, 8)))).isEmpty)
    // wrong mimetype content
    assert(parse(rebuild(1L)(es =>
      es.updated(0, ("mimetype", "application/zip".getBytes(utf8), 0)))).isEmpty)
    // container.xml missing
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "META-INF/container.xml"))).isEmpty)
    // a spine chapter file missing
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "OEBPS/ch0.xhtml"))).isEmpty)
    // dangling idref: drop a manifest item the spine needs
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "OEBPS/content.opf" =>
        (n, new String(d, utf8).replace("""<item id="c0" href="ch0.xhtml"""",
          """<item id="cX" href="ch0.xhtml"""").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // path traversal in a manifest href
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "OEBPS/content.opf" =>
        (n, new String(d, utf8).replace("""href="ch0.xhtml"""",
          """href="../ch0.xhtml"""").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // XML damage in the OPF
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "OEBPS/content.opf" =>
        (n, new String(d, utf8).replace("</package>", "</packag>").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // non-spine manifest entries (style.css) are tolerated and NOT emitted:
    // already pinned by the round-trip count == nChapters
  }

  test("OCF mimetype-first is a PHYSICAL rule: shuffled central directory still accepted") {
    // swap the first two central-directory records in place — the physical
    // layout (mimetype's local header at byte 0) is untouched, but a reader
    // keying the OCF 3.0 §3.3 check on CD order would now reject the book
    val book = Epub.renderEpub(2L)
    def u16(b: Array[Byte], p: Int) = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def u32(b: Array[Byte], p: Int) =
      (u16(b, p).toLong | (u16(b, p + 2).toLong << 16)).toInt
    var eocd = book.length - 22
    while (!(book(eocd) == 0x50 && book(eocd + 1) == 0x4b &&
      book(eocd + 2) == 5 && book(eocd + 3) == 6)) eocd -= 1
    val cd = u32(book, eocd + 16)
    def recLen(p: Int) = 46 + u16(book, p + 28) + u16(book, p + 30) + u16(book, p + 32)
    val len1 = recLen(cd)
    val len2 = recLen(cd + len1)
    val swapped = book.clone()
    System.arraycopy(book, cd + len1, swapped, cd, len2)
    System.arraycopy(book, cd, swapped, cd + len2, len1)
    val viaSwapped = Epub.parseEpub(2L, swapped, 1 << 26)
    assert(viaSwapped.nonEmpty && viaSwapped == Epub.parseEpub(2L, book, 1 << 26))
    // the negative (physically-first entry not mimetype quarantines) is
    // covered by the strictness test's `es.tail :+ es.head` arm — buildZip
    // keeps physical and CD order together, so that arm moves both
  }

  test("operator: per-chapter table, damage quarantines per book") {
    import spark.implicits._
    val docs = (0L until 16L).toDF("doc_id")
    val rows = Epub.epubExtract(Epub.encodeEpub(docs)).collect()
    assert(rows.groupBy(_.doc_id).view.mapValues(_.length).toMap ==
      (0L until 16L).map(id => id -> Epub.nChapters(id)).toMap)
    val mixed = Epub.encodeEpub(docs.filter($"doc_id" < 2)).as[(Long, Array[Byte])]
      .map { case (id, p) => if (id == 0L) (id, p.take(60)) else (id, p) }
      .toDF("doc_id", "payload")
    val surviving = Epub.epubExtract(mixed).collect().map(_.doc_id).distinct
    assert(surviving.sameElements(Array(1L)))
  }
}
