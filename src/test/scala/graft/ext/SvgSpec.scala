package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class SvgSpec extends AnyFunSuite {

  test("round-trip: tspan assembly in document order, anchors, shape census, entities") {
    for (id <- 0L until 64L) {
      val rows = Svg.parseSvg(id, Svg.renderSvg(id))
      assert(rows.length == Svg.nTexts(id), s"svg $id text count")
      rows.foreach { r =>
        val t = r.text_idx.toInt
        val (x, y) = Svg.anchorOf(id, t)
        assert(r.x == x && r.y == y, s"svg $id anchor $t")
        assert(r.n_shapes == Svg.nShapes(id), s"svg $id shapes")
        val b = Svg.textOf(id, t).getBytes("UTF-8")
        var cs = 0L
        b.foreach(v => cs = (cs * 31 + (v & 0xff)) % 1000000007L)
        assert(r.n_chars == b.length && r.checksum == cs, s"svg $id text $t")
      }
    }
  }

  test("damage: non-svg root, nested text, bad coordinate all quarantine") {
    val good = Svg.renderSvg(1L)
    assert(Svg.parseSvgSafe(1L, good).nonEmpty)
    assert(Svg.parseSvgSafe(1L, good.replace("<svg ", "<div ").replace("</svg>", "</div>")).isEmpty)
    // nested <text> inside <text>
    val nested = good.replaceFirst("<tspan font-weight=\"bold\">", "<text x=\"1\" y=\"2\">")
      .replaceFirst("</tspan>", "</text>")
    assert(Svg.parseSvgSafe(1L, nested).isEmpty)
    // non-integer coordinate: quarantine, never a rounded value
    val badCoord = good.replaceFirst("<text x=\"\\d+\"", "<text x=\"12.5\"")
    assert(Svg.parseSvgSafe(1L, badCoord).isEmpty)
    assert(Svg.parseSvgSafe(1L, "").isEmpty)
  }

  test("metadata round-trip: dims, viewBox sentinels, title/desc, census") {
    for (id <- 0L until 64L) {
      val m = Svg.parseSvgMeta(id, Svg.renderSvg(id))
      val (w, h) = Svg.dimsOf(id)
      assert(m.width == w && m.height == h, s"svg $id dims")
      if (id % 2 == 0)
        assert(m.vb_minx == id % 7 && m.vb_miny == id % 5 && m.vb_w == w && m.vb_h == h, s"svg $id viewBox")
      else
        assert(m.vb_minx == -1 && m.vb_miny == -1 && m.vb_w == -1 && m.vb_h == -1, s"svg $id no viewBox")
      assert(m.title == s"figure $id", s"svg $id title")
      assert(m.desc_text == Svg.descOf(id), s"svg $id desc")
      assert(m.n_texts == Svg.nTexts(id) && m.n_shapes == Svg.nShapes(id), s"svg $id census")
    }
  }

  test("metadata damage: missing dims, malformed viewBox, duplicate title quarantine") {
    val good = Svg.renderSvg(2L) // even id: carries a viewBox
    assert(Svg.parseSvgMetaSafe(2L, good).nonEmpty)
    assert(Svg.parseSvgMetaSafe(2L, good.replaceFirst(" width=\"\\d+\"", "")).isEmpty)
    // three-token viewBox: quarantine, never a guessed fourth value
    assert(Svg.parseSvgMetaSafe(2L,
      good.replaceFirst("viewBox=\"[^\"]+\"", "viewBox=\"0 0 64\"")).isEmpty)
    // float viewBox token: quarantine, never rounded
    assert(Svg.parseSvgMetaSafe(2L,
      good.replaceFirst("viewBox=\"[^\"]+\"", "viewBox=\"0 0 64.5 48\"")).isEmpty)
    val dupTitle = good.replaceFirst("</title>", "</title>\n  <title>again</title>")
    assert(Svg.parseSvgMetaSafe(2L, dupTitle).isEmpty)
  }

  test("operator: damaged document quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Svg.encodeSvg(docs).as[(Long, String)].map { case (id, t) =>
      if (id == 10L) (id, t.substring(0, t.length / 2)) else (id, t)
    }.toDF("doc_id", "svg_text")
    val got = Svg.svgText(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(10L))
    for (id <- (0L until 24L) if id != 10L)
      assert(byDoc(id).length == Svg.nTexts(id), s"svg $id")
  }
}
