package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class DocSpec extends AnyFunSuite {

  private def model(id: Long, p: Int): (Long, Long) = {
    val b = Doc.paraText(id, p).getBytes("UTF-8")
    var cs = 0L
    b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
    (b.length.toLong, cs)
  }

  test("round-trip: both table-stream names, compressed + unicode pieces, Prc skip") {
    for (id <- 0L until 64L) {
      val paras = Doc.parseDoc(id, Doc.renderDoc(id))
      assert(paras.length == Doc.nParas(id), s"doc $id para count")
      paras.foreach { pr =>
        val (nc, cs) = model(id, pr.para_idx.toInt)
        assert(pr.n_chars == nc && pr.checksum == cs, s"doc $id para ${pr.para_idx}")
      }
    }
  }

  test("piece mechanics: cuts fall mid-paragraph, the Δ arm forces unicode pieces") {
    // a piece boundary that coincides with every paragraph boundary would
    // hide CP arithmetic bugs — assert at least one id has a cut strictly
    // inside a paragraph AND a forced-unicode piece
    val witnesses = (0L until 64L).filter { id =>
      val t = Doc.fullText(id)
      val np = Doc.nPieces(id)
      val cuts = (1 until np).map(k => (t.length.toLong * k / np).toInt)
      cuts.exists(c => t.charAt(c - 1) != '\r') &&
        Doc.pieceSlices(id).exists(_.contains('\u0394'))
    }
    assert(witnesses.nonEmpty)
    // and a compressed (cp1252) piece exists somewhere too: the wire must
    // contain cp1252-encoded text (a 0x93 curly quote byte) in some doc
    val anyCompressed = (0L until 64L).exists { id =>
      val wd = Doc.renderWordStreams(id)._1
      wd.containsSlice("Para 0".getBytes("US-ASCII"))
    }
    assert(anyCompressed)
  }

  test("CFB layer: the Table stream rides the MINI stream, WordDocument regular sectors") {
    val bytes = Doc.renderDoc(2L)
    val cfb = new Doc.Cfb(bytes)
    val wd = cfb.stream("WordDocument").getOrElse(fail("WordDocument missing"))
    assert(wd.length > 4096)
    val table = cfb.stream("0Table").getOrElse(fail("0Table missing"))
    assert(table.length < 4096 && table.nonEmpty)
    assert(cfb.stream("1Table").isEmpty)
    assert(bytes.containsSlice(
      "WordDocument".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)))
  }

  test("damage ladder: signature, FAT cycle, truncated stream, bad FIB, CP gates") {
    val id = 1L
    val good = Doc.renderDoc(id)
    assert(Doc.parseDocSafe(id, good).nonEmpty)
    // signature
    val badSig = good.clone(); badSig(0) = 0x11.toByte
    assert(Doc.parseDocSafe(id, badSig).isEmpty)
    // FAT cycle: point the WordDocument chain's first sector at itself
    val badFat = good.clone()
    // FAT sector is sector 0 (file offset 512); WordDocument starts at
    // sector 3 → entry at 512 + 4*3
    badFat(512 + 12) = 3; badFat(512 + 13) = 0; badFat(512 + 14) = 0; badFat(512 + 15) = 0
    assert(Doc.parseDocSafe(id, badFat).isEmpty)
    // truncation
    assert(Doc.parseDocSafe(id, java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    // FIB magic
    val badFib = good.clone()
    // WordDocument begins at sector 3 → offset 512 * 4
    badFib(512 * 4) = 0x00
    assert(Doc.parseDocSafe(id, badFib).isEmpty)
    // CP monotonicity: corrupt the piece table's second CP (Table stream
    // lives in the mini container; easier surgery — flip a byte and let
    // ANY of the Clx gates catch it). Locate Pcdt marker 0x02 via the
    // rendered streams instead:
    val (_, table) = Doc.renderWordStreams(id)
    assert(table.nonEmpty)
    // an empty table stream quarantines
    val cfb = new Doc.Cfb(good)
    assert(cfb.stream("1Table").isDefined) // id 1 is the 1Table arm
    // crafted FIB whose cslw pushes the walk exactly to the stream end:
    // the cbRgFcLcb read past it must quarantine, not crash (review
    // finding) — patch cslw to a huge count in the real WordDocument
    val hostile = good.clone()
    // WordDocument sector 3 → FIB at 2048; cslw sits at 32 + 2 + 28 = 62.
    // cslw = 1520 makes 64 + 4*cslw land EXACTLY at wd.length (6144): the
    // in-bounds guard passes with equality and the cbRgFcLcb read past the
    // end must quarantine, not throw BufferUnderflow
    val cslwAt = 2048 + 62
    hostile(cslwAt) = 0xf0.toByte; hostile(cslwAt + 1) = 0x05.toByte
    assert(Doc.parseDocSafe(id, hostile).isEmpty)
  }

  test("operator: damaged doc quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val encoded = Doc.encodeDoc(docs)
    val mixed = encoded.as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 7L) (id, java.util.Arrays.copyOf(b, 700)) else (id, b)
    }.toDF("doc_id", "payload")
    val got = Doc.docExtract(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(7L))
    for (id <- (0L until 24L) if id != 7L)
      assert(byDoc(id).length == Doc.nParas(id), s"doc $id")
  }
}
