package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class GpxSpec extends AnyFunSuite {

  test("round-trip: segments, exact micro-degrees with negative arms, epoch math") {
    for (id <- 0L until 64L) {
      val pts = Gpx.parseGpx(id, Gpx.renderGpx(id))
      val expected = (0 until Gpx.nSegs(id)).map(s => Gpx.nPts(id, s)).sum
      assert(pts.length == expected, s"gpx $id point count")
      pts.foreach { r =>
        val (s, p) = (r.seg_idx.toInt, r.pt_idx.toInt)
        assert(r.lat_micro == Gpx.latMicro(id, s, p), s"gpx $id lat $s/$p")
        assert(r.lon_micro == Gpx.lonMicro(id, s, p), s"gpx $id lon $s/$p")
        assert(r.ele_m == Gpx.eleM(id, s, p), s"gpx $id ele $s/$p")
        assert(r.t_epoch == Gpx.timeEpoch(id, s, p), s"gpx $id time $s/$p")
      }
    }
    // negative coordinates occur across the id range
    val anyNegLat = (0L until 64L).exists(id => Gpx.latMicro(id, 0, 0) < 0)
    val anyNegLon = (0L until 64L).exists(id => Gpx.lonMicro(id, 0, 0) < 0)
    assert(anyNegLat && anyNegLon)
  }

  test("parseMicro: positional fraction scaling, never a float; profile gates") {
    assert(Gpx.parseMicro("12.345678", 90L) == 12345678L)
    assert(Gpx.parseMicro("-12.3", 90L) == -12300000L)
    assert(Gpx.parseMicro("0.000001", 90L) == 1L)
    assert(Gpx.parseMicro("7", 90L) == 7000000L)
    assert(Gpx.parseMicro("+3.14", 90L) == 3140000L)
    assert(Gpx.parseMicro("180.000000", 180L) == 180000000L) // boundary legal
    assertThrows[RuntimeException](Gpx.parseMicro("1.2345678", 90L)) // sub-micro
    assertThrows[RuntimeException](Gpx.parseMicro("12.", 90L))
    assertThrows[RuntimeException](Gpx.parseMicro(".5", 90L))
    assertThrows[RuntimeException](Gpx.parseMicro("1e3", 90L))
    assertThrows[RuntimeException](Gpx.parseMicro("1234.0", 180L)) // > 3 int digits
    assertThrows[RuntimeException](Gpx.parseMicro("91.0", 90L)) // impossible latitude
    assertThrows[RuntimeException](Gpx.parseMicro("180.000001", 180L)) // past the pole-to-pole bound
    assertThrows[RuntimeException](Gpx.parseMicro("", 90L))
  }

  test("parseIsoUtc: extended form only, leap-day valid, junk rejected") {
    assert(Gpx.parseIsoUtc("2024-02-29T01:02:03Z") ==
      java.time.LocalDate.of(2024, 2, 29).toEpochDay * 86400L + 3723L)
    assertThrows[RuntimeException](Gpx.parseIsoUtc("2023-02-29T01:02:03Z"))
    assertThrows[RuntimeException](Gpx.parseIsoUtc("20240229T010203Z")) // basic form
    assertThrows[RuntimeException](Gpx.parseIsoUtc("2024-02-28T01:02:03+01:00"))
    // an arbitrary :60 would alias to the next minute: out of profile
    assertThrows[RuntimeException](Gpx.parseIsoUtc("2016-12-31T23:59:60Z"))
  }

  test("damage: missing lat, bad ele, truncation all quarantine (Spark operator)") {
    val good = Gpx.renderGpx(3L)
    assert(Gpx.parseGpxSafe(3L, good).nonEmpty)
    assert(Gpx.parseGpxSafe(3L, good.replaceFirst(" lat=\"[^\"]+\"", "")).isEmpty)
    assert(Gpx.parseGpxSafe(3L, good.replaceFirst("<ele>-?\\d+</ele>", "<ele>high</ele>")).isEmpty)
    assert(Gpx.parseGpxSafe(3L, "").isEmpty)

    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Gpx.encodeGpx(docs).as[(Long, String)].map { case (id, t) =>
      if (id == 13L) (id, t.substring(0, t.length / 2)) else (id, t)
    }.toDF("doc_id", "gpx_text")
    val got = Gpx.gpxPoints(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(13L))
    for (id <- (0L until 24L) if id != 13L) {
      val expected = (0 until Gpx.nSegs(id)).map(s => Gpx.nPts(id, s)).sum
      assert(byDoc(id).length == expected, s"gpx $id")
    }
  }
}
