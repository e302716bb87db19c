package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ESRI Shapefile ingestion, from scratch — the lingua franca of
  * geospatial corpora (census tracts, OSM extracts, land registries).
  * Implemented per the published ESRI Shapefile Technical Description
  * (the 1998 white paper), `.shp` main file:
  *
  *  - the format's signature MIXED endianness handled explicitly: file
  *    code 9994 / file length / record headers BIG-endian, version /
  *    shape types / geometry LITTLE-endian — a reader that assumes one
  *    endianness misparses everything;
  *  - 100-byte header: file code, declared length in 16-bit words
  *    VERIFIED against the actual byte count, version 1000, shape
  *    type, bounding box;
  *  - records: sequential 1-based record numbers enforced, declared
  *    content length matched exactly against the walked geometry;
  *  - shapes: Null (0), Point (1), PolyLine (3), Polygon (5) — every
  *    record must carry the header's type or Null (the spec's
  *    homogeneity rule); part start indices must begin at 0, ascend
  *    strictly, and stay in range; polygon rings must CLOSE (first
  *    point == last point);
  *  - the header bounding box is CROSS-CHECKED against the min/max
  *    over all non-null geometry — a stale bbox is damage;
  *  - the file must end exactly at the last record.
  *
  * Scale shape: map-only per file, zero shuffles.
  */
object Shapefile {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def nib(id: Long, i: Int): Int = {
    val m = md5Hex(s"shp:$id")
    Integer.parseInt(m.substring(i - 1, i), 16)
  }

  // ------------------------------------------------------------- fixture

  /** 1 = points, 3 = polylines (+ one null record), 5 = polygon. */
  private[ext] def shapeTypeOf(id: Long): Int = (id % 3) match {
    case 0 => 1
    case 1 => 3
    case _ => 5
  }
  private[ext] def nPointRecsOf(id: Long): Int = 2 + nib(id, 1) % 3
  private[ext] def pointXOf(id: Long, k: Int): Double = id + 0.25 * k
  private[ext] def pointYOf(id: Long, k: Int): Double = 2.0 * id - 0.5 * k
  private[ext] def nLineRecsOf(id: Long): Int = 1 + (id % 2).toInt
  private[ext] def linePartsOf(id: Long, r: Int): Int = 1 + ((r + id) % 2).toInt
  private[ext] def lineXOf(id: Long, r: Int, j: Int): Double = id + 2.0 * r + 0.25 * j
  private[ext] def lineYOf(id: Long, r: Int, j: Int): Double = id - r - 0.125 * j

  private final class W {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = (3 to 0 by -1).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def leDouble(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xff).toInt))
    }
  }

  /** All records' geometry as (type, points, partStarts). */
  private def recordsOf(id: Long): Seq[(Int, Seq[(Double, Double)], Seq[Int])] =
    shapeTypeOf(id) match {
      case 1 =>
        (0 until nPointRecsOf(id)).map(k => (1, Seq((pointXOf(id, k), pointYOf(id, k))), Nil))
      case 3 =>
        val lines = (0 until nLineRecsOf(id)).map { r =>
          val np = 2 * linePartsOf(id, r)
          val pts = (0 until np).map(j => (lineXOf(id, r, j), lineYOf(id, r, j)))
          val parts = (0 until linePartsOf(id, r)).map(_ * 2)
          (3, pts, parts)
        }
        lines :+ ((0, Seq.empty[(Double, Double)], Seq.empty[Int])) // a null record
      case _ =>
        val x0 = id.toDouble
        val ring = Seq((x0, x0), (x0 + 1, x0), (x0 + 1, x0 + 1), (x0, x0 + 1), (x0, x0))
        Seq((5, ring, Seq(0)))
    }

  private[ext] def renderShp(id: Long): Array[Byte] = {
    val recs = recordsOf(id)
    val body = new W
    recs.zipWithIndex.foreach { case ((typ, pts, parts), i) =>
      val content = new W
      content.le32(typ)
      typ match {
        case 0 => ()
        case 1 =>
          content.leDouble(pts.head._1)
          content.leDouble(pts.head._2)
        case _ =>
          val xs = pts.map(_._1)
          val ys = pts.map(_._2)
          content.leDouble(xs.min); content.leDouble(ys.min)
          content.leDouble(xs.max); content.leDouble(ys.max)
          content.le32(parts.length)
          content.le32(pts.length)
          parts.foreach(content.le32)
          pts.foreach { case (x, y) => content.leDouble(x); content.leDouble(y) }
      }
      val cb = content.out.toByteArray
      body.be32(i + 1) // 1-based record number
      body.be32(cb.length / 2) // content length in 16-bit words
      body.out.write(cb, 0, cb.length)
    }
    val bodyBytes = body.out.toByteArray
    val all = recs.flatMap(_._2)
    val (xmin, ymin, xmax, ymax) =
      (all.map(_._1).min, all.map(_._2).min, all.map(_._1).max, all.map(_._2).max)
    val out = new W
    out.be32(9994)
    (0 until 5).foreach(_ => out.be32(0)) // unused
    out.be32((100 + bodyBytes.length) / 2) // file length in words
    out.le32(1000) // version
    out.le32(shapeTypeOf(id))
    out.leDouble(xmin); out.leDouble(ymin); out.leDouble(xmax); out.leDouble(ymax)
    (0 until 4).foreach(_ => out.leDouble(0.0)) // z/m ranges (2D)
    out.out.write(bodyBytes, 0, bodyBytes.length)
    out.out.toByteArray
  }

  /** Fixture writer: one .shp per document row. */
  def encodeShp(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      .as[Long]
      .map(id => (id, renderShp(id)))
      .toDF("doc_id", "shp")
  }

  // --------------------------------------------------------------- reader

  private final class MalformedShp
      extends RuntimeException("malformed shapefile", null, false, false)
  private def fail(): Nothing = throw new MalformedShp

  private val MaxLen = 1 << 26
  private val MaxPoints = 1 << 20

  private def be32At(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
  private def le32At(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def leDoubleAt(b: Array[Byte], p: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(p + i) & 0xffL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  final case class ShpRec(
    doc_id: Long, record_no: Long, shape_type: Long, n_parts: Long, n_points: Long,
    min_x: Double, min_y: Double, max_x: Double, max_y: Double,
    sum_x: Double, sum_y: Double)

  private[ext] def parseShp(id: Long, b: Array[Byte]): Seq[ShpRec] = {
    if (b == null || b.length < 100 || b.length > MaxLen) fail()
    if (be32At(b, 0) != 9994) fail()
    if (be32At(b, 24).toLong * 2 != b.length) fail() // declared length exact
    if (b.length % 2 != 0) fail()
    if (le32At(b, 28) != 1000) fail() // version
    val headerType = le32At(b, 32)
    if (headerType != 1 && headerType != 3 && headerType != 5) fail()
    val hxmin = leDoubleAt(b, 36)
    val hymin = leDoubleAt(b, 44)
    val hxmax = leDoubleAt(b, 52)
    val hymax = leDoubleAt(b, 60)
    var p = 100
    var expectNo = 1
    var (xmin, ymin, xmax, ymax) =
      (Double.PositiveInfinity, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.NegativeInfinity)
    var sawGeometry = false
    val out = Vector.newBuilder[ShpRec]
    while (p < b.length) {
      if (p + 12 > b.length) fail()
      if (be32At(b, p) != expectNo) fail() // sequential 1-based numbers
      val contentWords = be32At(b, p + 4)
      if (contentWords < 2 || contentWords.toLong * 2 > b.length - p - 8) fail()
      val cs = p + 8
      val ce = cs + contentWords * 2
      val typ = le32At(b, cs)
      if (typ != 0 && typ != headerType) fail() // homogeneity rule
      typ match {
        case 0 =>
          if (ce != cs + 4) fail()
          out += ShpRec(id, expectNo.toLong, 0L, 0L, 0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
        case 1 =>
          if (ce != cs + 20) fail()
          val x = leDoubleAt(b, cs + 4)
          val y = leDoubleAt(b, cs + 12)
          xmin = math.min(xmin, x); xmax = math.max(xmax, x)
          ymin = math.min(ymin, y); ymax = math.max(ymax, y)
          sawGeometry = true
          out += ShpRec(id, expectNo.toLong, 1L, 0L, 1L, x, y, x, y, x, y)
        case _ => // polyline / polygon share the layout
          if (ce < cs + 44) fail()
          val bxmin = leDoubleAt(b, cs + 4)
          val bymin = leDoubleAt(b, cs + 12)
          val bxmax = leDoubleAt(b, cs + 20)
          val bymax = leDoubleAt(b, cs + 28)
          val nParts = le32At(b, cs + 36)
          val nPoints = le32At(b, cs + 40)
          if (nParts < 1 || nPoints < 1 || nParts > MaxPoints || nPoints > MaxPoints) fail()
          if (ce != cs + 44 + 4 * nParts + 16 * nPoints) fail()
          val parts = (0 until nParts).map(i => le32At(b, cs + 44 + 4 * i))
          if (parts.head != 0) fail()
          parts.sliding(2).foreach { w => if (w.length == 2 && w(0) >= w(1)) fail() }
          if (parts.last >= nPoints) fail()
          val ps = cs + 44 + 4 * nParts
          var (sx, sy) = (0.0, 0.0)
          var (mnx, mny, mxx, mxy) =
            (Double.PositiveInfinity, Double.PositiveInfinity,
              Double.NegativeInfinity, Double.NegativeInfinity)
          val pts = (0 until nPoints).map { j =>
            val x = leDoubleAt(b, ps + 16 * j)
            val y = leDoubleAt(b, ps + 16 * j + 8)
            sx += x; sy += y
            mnx = math.min(mnx, x); mxx = math.max(mxx, x)
            mny = math.min(mny, y); mxy = math.max(mxy, y)
            (x, y)
          }
          if (mnx != bxmin || mny != bymin || mxx != bxmax || mxy != bymax) fail()
          if (typ == 5) {
            // rings must close: per part, first == last
            val bounds = parts :+ nPoints
            bounds.sliding(2).foreach {
              case Seq(s, e) => if (pts(s) != pts(e - 1)) fail()
              case _ => ()
            }
          }
          xmin = math.min(xmin, mnx); xmax = math.max(xmax, mxx)
          ymin = math.min(ymin, mny); ymax = math.max(ymax, mxy)
          sawGeometry = true
          out += ShpRec(id, expectNo.toLong, typ.toLong, nParts.toLong, nPoints.toLong,
            mnx, mny, mxx, mxy, sx, sy)
      }
      p = ce
      expectNo += 1
    }
    if (p != b.length) fail()
    if (!sawGeometry) fail()
    // header bbox must match the walked geometry exactly
    if (hxmin != xmin || hymin != ymin || hxmax != xmax || hymax != ymax) fail()
    out.result()
  }

  private[ext] def parseShpSafe(id: Long, b: Array[Byte]): Seq[ShpRec] =
    try parseShp(id, b)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** `shapefile_records`: the per-record geometry inventory. Map-only. */
  def shapefileRecords(docs: DataFrame, idCol: String = "doc_id",
                       binCol: String = "shp"): Dataset[ShpRec] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) => if (b == null) Nil else parseShpSafe(id, b) }
  }
}
