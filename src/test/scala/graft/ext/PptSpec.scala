package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class PptSpec extends AnyFunSuite {

  private def checksum(s: String): (Long, Long) = {
    val b = s.getBytes("UTF-8")
    var c = 0L
    b.foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
    (b.length.toLong, c)
  }

  test("round-trip: persist chain, both text atom kinds, cp1252 hazards, slide ids") {
    for (id <- 0L until 96L) {
      val rows = Ppt.parsePpt(id, Ppt.renderPpt(id))
      var k = 0
      for (j <- 0 until Ppt.nSlides(id); t <- 0 until Ppt.nTexts(id, j)) {
        val r = rows(k)
        assert(r.slide_idx == j && r.text_idx == t, s"ppt $id order")
        assert(r.slide_id == Ppt.slideIdOf(id, j), s"ppt $id slide id")
        val (n, c) = checksum(Ppt.textOf(id, j, t))
        assert(r.n_bytes == n && r.checksum == c,
          s"ppt $id slide $j text $t (${if (Ppt.isCharsArm(id, j, t)) "chars" else "bytes"} arm)")
        k += 1
      }
      assert(rows.length == k, s"ppt $id row count")
    }
    // both atom kinds and all hazard arms actually occur across the sweep
    assert((0L until 96L).exists(i => Ppt.isCharsArm(i, 0, 0)))
    assert((0L until 96L).exists(i => !Ppt.isCharsArm(i, 0, 0)))
    assert((0L until 96L).exists(i => Ppt.textOf(i, 0, 0).contains("“")))
    assert((0L until 96L).exists(i => Ppt.textOf(i, 0, 0).contains("Δ")))
  }

  test("the stale previous-edit decoy never surfaces (the chain is followed, not scanned)") {
    for (id <- 0L until 32L) {
      val bytes = Ppt.renderPpt(id)
      // the decoy text IS physically in the file...
      val (_, pp) = Ppt.renderPptStreams(id)
      assert(new String(pp, java.nio.charset.StandardCharsets.ISO_8859_1)
        .contains("STALE decoy"), s"ppt $id decoy present in stream")
      // ...and never in the output
      val rows = Ppt.parsePpt(id, bytes)
      rows.foreach { r =>
        val (n, c) = checksum(s"STALE decoy ${r.slide_idx}/${r.text_idx} must not surface")
        assert(!(r.n_bytes == n && r.checksum == c), s"ppt $id decoy surfaced")
      }
    }
  }

  test("damage ladder: encryption token, undefined cp1252 byte, broken structure quarantine") {
    val id = 7L
    val good = Ppt.renderPpt(id)
    assert(Ppt.parsePptSafe(id, good).nonEmpty)
    // flip the CurrentUserAtom header token to the ENCRYPTED magic
    def patched(find: Array[Byte], repl: Array[Byte]): Array[Byte] = {
      val b = good.clone()
      val at = b.indices.indexWhere(i =>
        i + find.length <= b.length && find.indices.forall(k => b(i + k) == find(k)))
      assert(at >= 0, "pattern present")
      repl.indices.foreach(k => b(at + k) = repl(k))
      b
    }
    val plainTok = Array(0x5F, 0xC0, 0x91, 0xE3).map(_.toByte)
    val encTok = Array(0xDF, 0xC4, 0xD1, 0xF3).map(_.toByte)
    assert(Ppt.parsePptSafe(id, patched(plainTok, encTok)).isEmpty, "encrypted quarantines")
    // an undefined cp1252 byte (0x81) inside a TextBytesAtom body
    val bytesArmText = (0 until Ppt.nSlides(id)).flatMap(j =>
      (0 until Ppt.nTexts(id, j)).map(t => (j, t))).find { case (j, t) => !Ppt.isCharsArm(id, j, t) }
    assert(bytesArmText.isDefined, "fixture has a bytes-arm text at id 7")
    val (bj, bt) = bytesArmText.get
    val marker = Ppt.cp1252Encode(s"s$bj t$bt of ppt $id:")
    val damagedByte = {
      val b = good.clone()
      // the LAST occurrence is the live container's copy (stale decoy is first)
      val at = (0 to b.length - marker.length).reverse.find(i =>
        marker.indices.forall(k => b(i + k) == marker(k)))
      assert(at.isDefined)
      b(at.get + 1) = 0x81.toByte
      b
    }
    assert(Ppt.parsePptSafe(id, damagedByte).isEmpty, "undefined cp1252 byte quarantines")
    // truncation
    assert(Ppt.parsePptSafe(id, good.take(good.length / 2)).isEmpty)
    assert(Ppt.parsePptSafe(id, Array.emptyByteArray).isEmpty)
  }

  test("operator: damaged document quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Ppt.encodePpt(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 11L) (id, b.take(b.length / 3)) else (id, b)
    }.toDF("doc_id", "ppt")
    val got = Ppt.pptExtract(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(11L))
    for (id <- (0L until 24L) if id != 11L) {
      val expected = (0 until Ppt.nSlides(id)).map(j => Ppt.nTexts(id, j)).sum
      assert(byDoc(id).length == expected, s"ppt $id")
    }
  }
}
