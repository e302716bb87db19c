package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class SfntSpec extends AnyFunSuite {

  test("round-trip: ttf, woff and woff2 containers recover the closed forms") {
    var sawTtf = false
    var sawWoff = false
    var sawWoff2 = false
    for (id <- 0L until 96L) {
      val m = Sfnt.parseFont(id, Sfnt.renderFont(id))
      val expected =
        if (!Sfnt.isWoff(id)) "ttf" else if (id % 2 == 0) "woff" else "woff2"
      assert(m.container == expected, s"font $id container")
      if (m.container == "ttf") sawTtf = true
      if (m.container == "woff") sawWoff = true
      if (m.container == "woff2") sawWoff2 = true
      assert(m.n_tables == 10, s"font $id tables")
      assert(m.units_per_em == Sfnt.unitsPerEmOf(id), s"font $id upem")
      assert(m.num_glyphs == Sfnt.numGlyphsOf(id), s"font $id glyphs")
      assert(m.family == Sfnt.familyOf(id), s"font $id family")
      assert(m.full_name == Sfnt.fullNameOf(id), s"font $id full name")
      assert(m.weight_class == Sfnt.weightOf(id), s"font $id weight")
      assert(m.n_name_records == 8, s"font $id name records")
    }
    assert(sawTtf && sawWoff && sawWoff2, "all three containers occur")
  }

  test("woff2: brotli stream + known-tag directory reproduce the ttf metadata") {
    val id = 5L // a woff2-arm id (id % 3 == 2, odd)
    assert(Sfnt.isWoff(id) && id % 2 == 1)
    val ttfMeta = Sfnt.parseFont(id, Sfnt.renderTtf(id))
    val w2Meta = Sfnt.parseFont(id, Sfnt.renderWoff2(id))
    assert(w2Meta.container == "woff2")
    assert(ttfMeta.copy(container = "x") == w2Meta.copy(container = "x"),
      "identical metadata through the woff2 container")
    // damage: flip the FIRST byte of the brotli stream (a late flip could
    // corrupt only an unread trailing table and slip through)
    val good = Sfnt.renderWoff2(id)
    val totalCompressed = (((good(20) & 0xff) << 24) | ((good(21) & 0xff) << 16) |
      ((good(22) & 0xff) << 8) | (good(23) & 0xff))
    val streamStart = good.length - totalCompressed
    val bad = good.clone()
    bad(streamStart) = (bad(streamStart) ^ 0x55).toByte
    assert(Sfnt.parseFontSafe(id, bad).isEmpty, "brotli damage quarantines")
    // damage: declared length mismatch
    val bad2 = good.clone()
    bad2(11) = (bad2(11) ^ 1).toByte
    assert(Sfnt.parseFontSafe(id, bad2).isEmpty, "length mismatch quarantines")
    // a transformed-glyf flag (version 0 for glyf) is outside the subset
    val bad3 = good.clone()
    // first directory entry starts at 48; find the glyf entry byte by
    // scanning flags: entries are [flags][tag?][base128...]; rather than
    // reimplement the walk, flip the first entry's transform bits and
    // expect SOME quarantine (either unknown transform or tag break)
    bad3(48) = ((bad3(48) & 0x3f) | 0x80).toByte
    assert(Sfnt.parseFontSafe(id, bad3).isEmpty, "transformed tables quarantine")
  }

  test("foreign differential: the JDK's native sfnt loader accepts the fonts") {
    for (id <- Seq(0L, 1L, 3L, 4L)) { // ttf-arm ids (id % 3 != 2)
      val bytes = Sfnt.renderTtf(id)
      val font = java.awt.Font.createFont(
        java.awt.Font.TRUETYPE_FONT, new java.io.ByteArrayInputStream(bytes))
      assert(font.getFamily(java.util.Locale.ENGLISH) == Sfnt.familyOf(id), s"font $id family")
      assert(font.getNumGlyphs == Sfnt.numGlyphsOf(id), s"font $id glyph count")
      assert(font.canDisplay('A'), s"font $id must map 'A' (cmap format 4)")
      assert(!font.canDisplay('B'), s"font $id must NOT map 'B'")
    }
  }

  test("woff round-trips to the identical table bytes, zlib and stored arms both") {
    val id = 2L // a woff-arm id
    assert(Sfnt.isWoff(id))
    val ttfMeta = Sfnt.parseFont(id, Sfnt.renderTtf(id))
    val woffMeta = Sfnt.parseFont(id, Sfnt.renderWoff(id))
    assert(ttfMeta.copy(container = "x") == woffMeta.copy(container = "x"),
      "identical metadata through both containers")
  }

  test("OS/2 version 0 is exactly the spec's 78 bytes") {
    val b = Sfnt.renderTtf(3L)
    val n = ((b(4) & 0xff) << 8) | (b(5) & 0xff)
    val entry = (0 until n).find(i => new String(b, 12 + 16 * i, 4, "ISO-8859-1") == "OS/2").get
    val len = (((b(12 + 16 * entry + 12) & 0xffL) << 24) | ((b(12 + 16 * entry + 13) & 0xffL) << 16) |
      ((b(12 + 16 * entry + 14) & 0xffL) << 8) | (b(12 + 16 * entry + 15) & 0xffL)).toInt
    assert(len == 78, "version-0 OS/2 must be 78 bytes (sTypo/usWin fields included)")
  }

  test("checksums: table sums and the 0xB1B0AFBA whole-font rule hold as written") {
    val b = Sfnt.renderTtf(5L)
    def u32(p: Int): Long = ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    val n = ((b(4) & 0xff) << 8) | (b(5) & 0xff)
    var whole = 0L
    var i = 0
    while (i < b.length) {
      var w = 0L
      for (j <- 0 until 4) w = (w << 8) | (if (i + j < b.length) b(i + j) & 0xffL else 0L)
      whole = (whole + w) & 0xffffffffL
      i += 4
    }
    assert(whole == 0xB1B0AFBAL, "whole-font checksum must hit the magic constant")
    for (t <- 0 until n) {
      val p = 12 + 16 * t
      val tag = new String(b, p, 4, "ISO-8859-1")
      val declared = u32(p + 4)
      val off = u32(p + 8).toInt
      val len = u32(p + 12).toInt
      var sum = 0L
      var q = off
      while (q < off + len) {
        var w = 0L
        for (j <- 0 until 4) w = (w << 8) | (if (q + j < off + len) b(q + j) & 0xffL else 0L)
        sum = (sum + w) & 0xffffffffL
        q += 4
      }
      // head's declared checksum is computed over adjustment = 0; after
      // patching, the recomputed value differs by exactly the adjustment
      if (tag == "head") {
        val adj = u32(off + 8)
        assert(((sum - adj) & 0xffffffffL) == declared, s"$tag checksum (mod adjustment)")
      } else assert(sum == declared, s"$tag checksum")
    }
  }

  test("damage ladder: version, head magic, bounds, woff sizes quarantine") {
    val id = 7L
    val ttf = Sfnt.renderTtf(id)
    def mut(b: Array[Byte], at: Int, v: Byte): Array[Byte] = { val c = b.clone(); c(at) = v; c }
    assert(Sfnt.parseFontSafe(id, mut(ttf, 0, 9.toByte)).isEmpty, "sfnt version")
    assert(Sfnt.parseFontSafe(id, ttf.take(40)).isEmpty, "truncation")
    assert(Sfnt.parseFontSafe(id, Array.emptyByteArray).isEmpty)
    // find head's offset and smash its magic
    val n = ((ttf(4) & 0xff) << 8) | (ttf(5) & 0xff)
    val headOff = (0 until n).collectFirst {
      case i if new String(ttf, 12 + 16 * i, 4, "ISO-8859-1") == "head" =>
        (((ttf(12 + 16 * i + 8) & 0xffL) << 24) | ((ttf(12 + 16 * i + 9) & 0xffL) << 16) |
          ((ttf(12 + 16 * i + 10) & 0xffL) << 8) | (ttf(12 + 16 * i + 11) & 0xffL)).toInt
    }.get
    assert(Sfnt.parseFontSafe(id, mut(ttf, headOff + 12, 0.toByte)).isEmpty, "head magic")
    val woff = Sfnt.renderWoff(2L)
    assert(Sfnt.parseFontSafe(2L, mut(woff, 8, 0x7f.toByte)).isEmpty, "woff total length")
    assert(Sfnt.parseFontSafe(2L, woff.take(60)).isEmpty, "woff truncation")
    // flip a byte inside a compressed table: adler32 must catch it
    assert(Sfnt.parseFontSafe(2L, mut(woff, woff.length - 9, 0x55.toByte)).isEmpty,
      "zlib damage")
  }

  test("operator: damaged font quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Sfnt.encodeFonts(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 7)) else (id, b)
    }.toDF("doc_id", "font")
    val got = Sfnt.ttfMeta(mixed).collect()
    assert(!got.exists(_.doc_id == 8L))
    assert(got.length == 23)
  }
}
