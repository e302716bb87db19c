package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class ShapefileSpec extends AnyFunSuite {

  test("round-trip: every fixture file recovers its closed forms") {
    for (id <- 0L until 96L) {
      val recs = Shapefile.parseShp(id, Shapefile.renderShp(id))
      Shapefile.shapeTypeOf(id) match {
        case 1 =>
          assert(recs.length == Shapefile.nPointRecsOf(id), s"shp $id point count")
          recs.zipWithIndex.foreach { case (r, k) =>
            assert(r.record_no == k + 1 && r.shape_type == 1 && r.n_points == 1, s"shp $id k$k")
            assert(r.min_x == Shapefile.pointXOf(id, k) && r.sum_x == r.min_x, s"shp $id k$k x")
            assert(r.min_y == Shapefile.pointYOf(id, k) && r.sum_y == r.min_y, s"shp $id k$k y")
          }
        case 3 =>
          val nr = Shapefile.nLineRecsOf(id)
          assert(recs.length == nr + 1, s"shp $id line count (incl null)")
          assert(recs.last.shape_type == 0 && recs.last.n_points == 0, s"shp $id null record")
          (0 until nr).foreach { r =>
            val rec = recs(r)
            val parts = Shapefile.linePartsOf(id, r)
            val np = 2 * parts
            assert(rec.n_parts == parts && rec.n_points == np, s"shp $id r$r shape")
            assert(rec.min_x == Shapefile.lineXOf(id, r, 0), s"shp $id r$r min_x")
            assert(rec.max_x == Shapefile.lineXOf(id, r, np - 1), s"shp $id r$r max_x")
            assert(rec.max_y == Shapefile.lineYOf(id, r, 0), s"shp $id r$r max_y")
            assert(rec.min_y == Shapefile.lineYOf(id, r, np - 1), s"shp $id r$r min_y")
            val sx = (0 until np).foldLeft(0.0)((a, j) => a + Shapefile.lineXOf(id, r, j))
            assert(rec.sum_x == sx, s"shp $id r$r sum_x")
          }
        case _ =>
          assert(recs.length == 1 && recs.head.shape_type == 5, s"shp $id polygon")
          val r = recs.head
          assert(r.n_parts == 1 && r.n_points == 5, s"shp $id ring shape")
          assert(r.min_x == id.toDouble && r.max_x == id + 1.0, s"shp $id bbox")
          assert(r.sum_x == 5.0 * id + 2 && r.sum_y == 5.0 * id + 2, s"shp $id sums")
      }
    }
  }

  test("header rules: file code, length, version, bbox cross-check") {
    val good = Shapefile.renderShp(3L)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Shapefile.parseShpSafe(3L, good).nonEmpty)
    assert(Shapefile.parseShpSafe(3L, mut(3, 0)).isEmpty, "wrong file code") // 9994's BE LSB
    assert(Shapefile.parseShpSafe(3L, mut(27, (good(27) + 1).toByte)).isEmpty,
      "declared length mismatch")
    assert(Shapefile.parseShpSafe(3L, mut(28, 0x01)).isEmpty, "wrong version")
    // corrupt a header bbox byte: the cross-check against walked geometry fires
    assert(Shapefile.parseShpSafe(3L, mut(36, (good(36) ^ 1).toByte)).isEmpty,
      "stale header bbox is damage")
    assert(Shapefile.parseShpSafe(3L, good ++ Array[Byte](0, 0)).isEmpty, "trailing garbage")
    assert(Shapefile.parseShpSafe(3L, good.dropRight(2)).isEmpty, "truncation")
  }

  test("record rules: sequential numbers, homogeneity, ring closure") {
    // id=4: id%3=1 -> polyline file with a null record
    val line = Shapefile.renderShp(4L)
    def mutL(at: Int, v: Byte): Array[Byte] = { val b = line.clone(); b(at) = v; b }
    // record numbers: first record number lives at byte 100..103 (BE)
    assert(Shapefile.parseShpSafe(4L, mutL(103, 2)).isEmpty, "record numbers must be sequential")
    // homogeneity: flip the first record's shape type (LE at 108) to Point
    assert(Shapefile.parseShpSafe(4L, mutL(108, 1)).isEmpty,
      "a foreign shape type in a polyline file is damage")
    // ring closure: id=2 -> polygon; nudge the closing point's x (last 16
    // bytes are the closing point)
    val poly = Shapefile.renderShp(2L)
    val lastPointX = poly.length - 16
    val broken = poly.clone()
    broken(lastPointX) = (broken(lastPointX) ^ 1).toByte
    assert(Shapefile.parseShpSafe(2L, broken).isEmpty, "unclosed polygon ring is damage")
    // per-record bbox cross-check: corrupt the polyline record's bbox
    // (content starts at 108: type at 108, bbox at 112)
    assert(Shapefile.parseShpSafe(4L, mutL(112, (line(112) ^ 1).toByte)).isEmpty,
      "stale record bbox is damage")
  }

  test("part-index discipline") {
    // hand-mutate a 2-part polyline so parts[1] does not ascend. id=1:
    // id%3=1, r=0 has parts=1+(0+1)%2=2 -> parts array [0, 2] at content+40+4... find it
    val b = Shapefile.renderShp(1L)
    // record content starts at 108; nParts at +36, nPoints at +40, parts at +44
    val partsAt = 108 + 44
    val numParts = (b(108 + 36) & 0xff)
    assert(numParts == 2, "fixture r0 of id=1 is 2-part")
    val bad = b.clone()
    bad(partsAt + 4) = 0 // second part start = 0 (not ascending)
    assert(Shapefile.parseShpSafe(1L, bad).isEmpty, "non-ascending part starts are damage")
    val oob = b.clone()
    oob(partsAt + 4) = 9 // >= nPoints
    assert(Shapefile.parseShpSafe(1L, oob).isEmpty, "part start past nPoints is damage")
  }
}
