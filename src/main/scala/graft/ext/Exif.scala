package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXIF metadata over the JPEG shelf — and the PII-scrub pass a multimodal
  * training corpus needs before anything ships.
  *
  * Crawled JPEGs carry an APP1 "Exif" segment: a complete little- or
  * big-endian TIFF structure (the [[Tiff]] wire form, re-walked here with
  * EXIF's tag vocabulary) holding camera make/model, orientation, capture
  * time, pixel dimensions — and, critically, a GPS sub-IFD with the exact
  * capture coordinates. For training data that is PII: the standard
  * curation step is (1) EXTRACT the metadata you want to keep as columns
  * (orientation feeds augmentation, dimensions feed dedup/bucketing), then
  * (2) STRIP the metadata segments from the payload so no coordinate or
  * serial number survives into the training set.
  *
  *  - '''[[exifFeatures]]''' (`exif_meta`): the marker walk finds APP1 with
  *    the `Exif\0\0` signature; the TIFF walk — BOTH byte orders — reads
  *    IFD0 (Make 0x010F, Model 0x0110, Orientation 0x0112, DateTime
  *    0x0132), the Exif sub-IFD through pointer 0x8769 (PixelX/YDimension
  *    0xA002/0xA003), and the GPS sub-IFD through 0x8825 (lat/lon refs +
  *    3-RATIONAL degree/minute/second triples). Coordinates are emitted in
  *    EXACT integer centi-arcseconds (`deg*360000 + min*6000 +
  *    100*sec_num/sec_den` with the fixture's den=100 — no IEEE division
  *    anywhere), signed by the N/S–E/W refs. A JPEG without an Exif APP1
  *    yields a `has_exif = false` row (absence is data, not damage); a
  *    PRESENT-but-malformed TIFF structure quarantines the document.
  *  - '''[[exifStrip]]''' (`exif_strip`): removes every APP1–APP15 and COM
  *    segment (JFIF's APP0 stays — it carries no PII), leaves the entropy
  *    stream untouched from SOS on, and PROVES the scrub: the stripped
  *    payload must still decode ([[Multimodal.parseJpeg]]) to the identical
  *    pixel plane (width/height/rolling checksum), and a re-parse must
  *    find no EXIF. Scrub-then-verify in one pass.
  *
  * Fixture: [[encodeExifJpeg]] splices a deterministic APP1 (closed-form
  * from `md5("exif:" ++ id)` nibbles — the oracle replays every field) into
  * the real [[Multimodal.encodeJpeg]] baseline JPEGs, immediately after
  * SOI as the EXIF spec places it. `id % 2` cycles the TIFF byte order,
  * `id % 3 == 2` drops the GPS IFD (metadata minus location is common),
  * `id % 7 == 3` carries no EXIF at all.
  *
  * Scale shape: map-only per document (marker walk + bounded TIFF walk in
  * one typed flatMap), zero shuffles; every count and offset is validated
  * against the segment before any read, IFD entry counts capped, so a
  * hostile payload cannot allocate or loop. No reference citation possible
  * — the reference (`src/flinkarima.py:379-416`) has no image surface;
  * north-star scope beside the [[Multimodal]] codec ladder.
  */
object Exif {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val makes = Array(
    "aperture", "bellows", "contour", "dial", "emulsion", "fstop", "grain", "halide")

  // ------------------------------------------------------------- fixture

  private[ext] def hasExif(id: Long): Boolean = id % 7 != 3
  private[ext] def hasGps(id: Long): Boolean = hasExif(id) && id % 3 != 2

  /** Closed-form field model — the oracle replays exactly this. */
  private[ext] def fieldModel(id: Long): (String, Long, String, String, String,
      Long, Long, Long, Long) = {
    val m = md5Hex(s"exif:$id")
    def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
    val order = if (id % 2 == 0) "II" else "MM"
    val orientation = 1L + nib(1) % 8
    val make = makes(nib(2) % 8)
    val model = s"M-${nib(3)}"
    val ts = f"${2000 + nib(4)}:${1 + nib(5) % 12}%02d:${1 + nib(6) % 28}%02d" +
      f" ${(nib(7) * 2) % 24}%02d:${(nib(8) * 4) % 60}%02d:${(nib(9) * 4) % 60}%02d"
    val latSign = if (nib(11) % 2 == 0) 1L else -1L
    val latCasec = latSign *
      (nib(12).toLong * 6 * 360000 + nib(13).toLong * 3 * 6000 + nib(14).toLong * 350 + nib(15))
    val lonSign = if (nib(16) % 2 == 0) 1L else -1L
    val lonCasec = lonSign *
      (nib(17).toLong * 11 * 360000 + nib(18).toLong * 3 * 6000 + nib(19).toLong * 350 + nib(20))
    val w = 8L * (1 + id % 4)
    val h = 8L * (1 + (id / 4) % 3)
    (order, orientation, make, model, ts, w, h, latCasec, lonCasec)
  }

  /** Serialize the deterministic APP1 payload (marker + length NOT
    * included): `Exif\0\0` + a complete TIFF block in the id's byte order.
    */
  private[ext] def exifApp1(id: Long): Array[Byte] = {
    val (order, orientation, make, model, ts, w, h, latC, lonC) = fieldModel(id)
    val le = order == "II"
    val gps = hasGps(id)
    val out = new java.io.ByteArrayOutputStream(256)
    def b(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = if (le) { b(v); b(v >> 8) } else { b(v >> 8); b(v) }
    def u32(v: Long): Unit = {
      val x = v.toInt
      if (le) { b(x); b(x >> 8); b(x >> 16); b(x >> 24) }
      else { b(x >> 24); b(x >> 16); b(x >> 8); b(x) }
    }
    out.write("Exif".getBytes("US-ASCII")); b(0); b(0)
    val tiffBase = out.size // offsets below are relative to here
    out.write((if (le) "II" else "MM").getBytes("US-ASCII"))
    u16(42)
    u32(8) // IFD0 right after the header

    val makeB = make.getBytes("US-ASCII") :+ 0.toByte
    val modelB = model.getBytes("US-ASCII") :+ 0.toByte
    val tsB = ts.getBytes("US-ASCII") :+ 0.toByte // count 20
    val n0 = if (gps) 6 else 5
    val ifd0Size = 2 + n0 * 12 + 4
    val exifOff = 8 + ifd0Size
    val exifSize = 2 + 3 * 12 + 4
    val gpsOff = exifOff + exifSize
    val gpsSize = if (gps) 2 + 4 * 12 + 4 else 0
    var dataOff = gpsOff + gpsSize
    val makeOff = dataOff; dataOff += makeB.length
    val modelOff = dataOff; dataOff += modelB.length
    val tsOff = dataOff; dataOff += tsB.length
    val latOff = dataOff; dataOff += 24
    val lonOff = dataOff

    // one IFD entry; `inline` packs small values left-justified in the
    // 4-byte field per the TIFF rule (endian-sensitive for SHORTs)
    def entry(tag: Int, typ: Int, count: Long)(value: => Unit): Unit = {
      u16(tag); u16(typ); u32(count)
      val before = out.size
      value
      while (out.size < before + 4) b(0)
      require(out.size == before + 4)
    }
    def ifdStart(n: Int): Unit = u16(n)
    def ifdEnd(): Unit = u32(0)
    // the TIFF inline rule: a value of <= 4 bytes lives IN the value field
    // (model "M-9" is exactly 4 with its NUL), longer ones by offset — the
    // reader must dispatch on count, and this fixture exercises both
    def asciiEntry(tag: Int, data: Array[Byte], off: Int): Unit =
      entry(tag, 2, data.length.toLong)(
        if (data.length <= 4) out.write(data) else u32(off.toLong))

    ifdStart(n0)
    asciiEntry(0x010f, makeB, makeOff)
    asciiEntry(0x0110, modelB, modelOff)
    entry(0x0112, 3, 1)(u16(orientation.toInt))
    entry(0x0132, 2, tsB.length.toLong)(u32(tsOff.toLong))
    entry(0x8769, 4, 1)(u32(exifOff.toLong))
    if (gps) entry(0x8825, 4, 1)(u32(gpsOff.toLong))
    ifdEnd()

    ifdStart(3) // Exif sub-IFD
    entry(0x9000, 7, 4)(out.write("0230".getBytes("US-ASCII")))
    entry(0xa002, 4, 1)(u32(w))
    entry(0xa003, 4, 1)(u32(h))
    ifdEnd()

    if (gps) {
      ifdStart(4)
      entry(0x0001, 2, 2)(out.write((if (latC >= 0) "N" else "S").getBytes("US-ASCII") :+ 0.toByte))
      entry(0x0002, 5, 3)(u32(latOff.toLong))
      entry(0x0003, 2, 2)(out.write((if (lonC >= 0) "E" else "W").getBytes("US-ASCII") :+ 0.toByte))
      entry(0x0004, 5, 3)(u32(lonOff.toLong))
      ifdEnd()
    }

    out.write(makeB); out.write(modelB); out.write(tsB)
    if (gps) {
      def rats(casec: Long): Unit = {
        u32(casec / 360000); u32(1) // degrees
        u32(casec % 360000 / 6000); u32(1) // minutes
        u32(casec % 6000); u32(100) // seconds, den 100 (centi-arcseconds)
      }
      rats(math.abs(latC)); rats(math.abs(lonC))
    }
    require(out.size - tiffBase == (if (gps) lonOff + 24 else latOff))
    out.toByteArray
  }

  /** Splice the deterministic EXIF APP1 into the real baseline JPEGs from
    * [[Multimodal.encodeJpeg]], immediately after SOI (where the EXIF spec
    * places it — JFIF's APP0 follows, an order real dual-segment files
    * use). `id % 7 == 3` documents pass through untouched (no EXIF).
    */
  def encodeExifJpeg(jpegs: DataFrame, idCol: String = "doc_id",
                     binCol: String = "payload"): DataFrame = {
    val spark = jpegs.sparkSession
    import spark.implicits._
    jpegs
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        if (!hasExif(id)) (id, bytes)
        else {
          val app1 = exifApp1(id)
          val out = new java.io.ByteArrayOutputStream(bytes.length + app1.length + 4)
          out.write(bytes, 0, 2) // SOI
          out.write(0xff); out.write(0xe1)
          val len = app1.length + 2
          out.write((len >> 8) & 0xff); out.write(len & 0xff)
          out.write(app1)
          out.write(bytes, 2, bytes.length - 2)
          (id, out.toByteArray)
        }
      }
      .toDF(idCol, binCol)
  }

  // -------------------------------------------------------------- parser

  private final class MalformedExif
      extends RuntimeException("malformed exif", null, false, false)
  private def fail(): Nothing = throw new MalformedExif

  final case class ExifMeta(
      doc_id: Long, has_exif: Boolean, byte_order: Option[String],
      orientation: Option[Long], make: Option[String], model: Option[String],
      ts: Option[String], px_w: Option[Long], px_h: Option[Long],
      has_gps: Boolean, lat_casec: Option[Long], lon_casec: Option[Long])

  /** THE marker walk, shared by extract and scrub (one structural-validity
    * definition, so the pair can never disagree): every segment between
    * SOI and SOS/EOI as (marker, segStart, payloadOff, payloadLen) —
    * standalone markers carry payloadLen 0 with payloadOff = segStart+2,
    * so `payloadOff + payloadLen` is the segment end uniformly — plus the
    * TAIL position (the SOS or EOI marker, from which bytes flow
    * verbatim). Anything structurally broken fails.
    */
  private def walkSegments(bytes: Array[Byte]): (Vector[(Int, Int, Int, Int)], Int) = {
    val n = bytes.length
    if (n < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) fail()
    val segs = Vector.newBuilder[(Int, Int, Int, Int)]
    var p = 2
    var guard = 0
    while (p < n) {
      guard += 1; if (guard > (1 << 16)) fail()
      if (p + 2 > n || (bytes(p) & 0xff) != 0xff) fail()
      val m = bytes(p + 1) & 0xff
      if (m == 0xd9 || m == 0xda) return (segs.result(), p) // EOI / SOS
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        segs += ((m, p, p + 2, 0)); p += 2
      } else {
        if (p + 4 > n) fail()
        val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > n) fail()
        segs += ((m, p, p + 4, len - 2))
        p += 2 + len
      }
    }
    fail()
  }

  /** Parse the TIFF block of an EXIF APP1 (`data` starts at `Exif\0\0`). */
  private def parseTiffBlock(id: Long, data: Array[Byte], off0: Int, len: Int): ExifMeta = {
    val base = off0 + 6 // past Exif\0\0
    val end = off0 + len
    if (len < 14) fail()
    val le = (data(base) & 0xff, data(base + 1) & 0xff) match {
      case (0x49, 0x49) => true
      case (0x4d, 0x4d) => false
      case _ => fail()
    }
    def u16(p: Int): Int = {
      if (p < base || p + 2 > end) fail()
      if (le) (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8)
      else ((data(p) & 0xff) << 8) | (data(p + 1) & 0xff)
    }
    def u32(p: Int): Long = {
      if (p < base || p + 4 > end) fail()
      if (le) (data(p) & 0xffL) | ((data(p + 1) & 0xffL) << 8) |
        ((data(p + 2) & 0xffL) << 16) | ((data(p + 3) & 0xffL) << 24)
      else ((data(p) & 0xffL) << 24) | ((data(p + 1) & 0xffL) << 16) |
        ((data(p + 2) & 0xffL) << 8) | (data(p + 3) & 0xffL)
    }
    if (u16(base + 2) != 42) fail()

    /** IFD at tiff-relative `off` → map tag → (type, count, value-field pos). */
    def ifd(off: Long): Map[Int, (Int, Long, Int)] = {
      if (off < 0 || off > Int.MaxValue) fail()
      val p0 = base + off.toInt
      val n = u16(p0)
      if (n > 256) fail() // hostile entry-count cap
      (0 until n).map { i =>
        val e = p0 + 2 + 12 * i
        u16(e) -> ((u16(e + 2), u32(e + 4), e + 8))
      }.toMap
    }
    def ascii(t: (Int, Long, Int)): String = {
      val (typ, count, vpos) = t
      if (typ != 2 || count < 1 || count > 4096) fail()
      val at = if (count <= 4) vpos else base + u32(vpos).toInt
      if (at < base || at + count > end) fail()
      val raw = new String(data, at, count.toInt, "US-ASCII")
      raw.takeWhile(_ != '\u0000')
    }
    def long1(t: (Int, Long, Int)): Long = {
      val (typ, count, vpos) = t
      if (count != 1) fail()
      typ match {
        case 3 => u16(vpos).toLong
        case 4 => u32(vpos)
        case _ => fail()
      }
    }
    /** 3-RATIONAL dms triple → exact centi-arcseconds. Denominators other
      * than (1,1,100) convert with the exact integer scale when it
      * divides, else fail (never a rounded coordinate).
      */
    def dmsCasec(t: (Int, Long, Int)): Long = {
      val (typ, count, vpos) = t
      if (typ != 5 || count != 3) fail()
      val at = base + u32(vpos).toInt
      if (at < base || at + 24 > end) fail()
      def rat(i: Int): (Long, Long) = (u32(at + 8 * i), u32(at + 8 * i + 4))
      val scales = Array(360000L, 6000L, 100L)
      (0 until 3).map { i =>
        val (num, den) = rat(i)
        if (den == 0) fail()
        val scaled = num * scales(i)
        if (scaled % den != 0) fail()
        scaled / den
      }.sum
    }

    val ifd0 = ifd(u32(base + 4))
    val make = ifd0.get(0x010f).map(ascii)
    val model = ifd0.get(0x0110).map(ascii)
    val orientation = ifd0.get(0x0112).map(long1)
    val ts = ifd0.get(0x0132).map(ascii)
    val exifIfd = ifd0.get(0x8769).map(t => ifd(long1(t)))
    val pxW = exifIfd.flatMap(_.get(0xa002)).map(long1)
    val pxH = exifIfd.flatMap(_.get(0xa003)).map(long1)
    val gpsIfd = ifd0.get(0x8825).map(t => ifd(long1(t)))
    def signed(refTag: Int, valTag: Int, pos: String): Option[Long] =
      gpsIfd.flatMap { g =>
        (g.get(refTag), g.get(valTag)) match {
          case (Some(r), Some(v)) =>
            val sign = if (ascii(r) == pos) 1L else -1L
            Some(sign * dmsCasec(v))
          case (None, None) => None
          case _ => fail() // a ref without a value (or vice versa) is damage
        }
      }
    val lat = signed(0x0001, 0x0002, "N")
    val lon = signed(0x0003, 0x0004, "E")
    ExifMeta(id, has_exif = true, Some(if (le) "II" else "MM"), orientation,
      make, model, ts, pxW, pxH,
      has_gps = lat.isDefined && lon.isDefined, lat, lon)
  }

  private val ExifSig = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0)

  private[ext] def parseExif(id: Long, bytes: Array[Byte]): ExifMeta = {
    val app1 = walkSegments(bytes)._1.find { case (m, _, off, len) =>
      m == 0xe1 && len >= 6 && (0 until 6).forall(i => bytes(off + i) == ExifSig(i))
    }
    app1 match {
      case Some((_, _, off, len)) => parseTiffBlock(id, bytes, off, len)
      case None => ExifMeta(id, has_exif = false, None, None, None, None, None,
        None, None, has_gps = false, None, None)
    }
  }

  /** `exif_meta`: one metadata row per JPEG; a present-but-broken EXIF
    * block quarantines the document, a missing one is a `has_exif=false`
    * row. Map-only, zero shuffles.
    */
  def exifFeatures(withBinary: DataFrame, idCol: String = "doc_id",
                   binCol: String = "payload"): Dataset[ExifMeta] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytesOrNull) =>
        try Some(parseExif(id, Option(bytesOrNull).getOrElse(Array.empty)))
        catch { case _: MalformedExif => None }
      }
  }

  // --------------------------------------------------------------- scrub

  /** Remove every APP1–APP15 and COM segment; APP0 and all structural
    * segments stay; the entropy stream from SOS on is untouched. Rides
    * the SAME [[walkSegments]] the extractor uses, so scrub and verify
    * cannot disagree on structural validity.
    */
  private[ext] def stripMetadata(bytes: Array[Byte]): Array[Byte] = {
    val (segs, tail) = walkSegments(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    out.write(0xff); out.write(0xd8)
    segs.foreach { case (m, start, payOff, payLen) =>
      val drop = (m >= 0xe1 && m <= 0xef) || m == 0xfe
      if (!drop) out.write(bytes, start, payOff + payLen - start)
    }
    out.write(bytes, tail, bytes.length - tail)
    out.toByteArray
  }

  final case class ExifStrip(
      doc_id: Long, had_exif: Boolean, exif_after: Boolean,
      width: Int, height: Int, checksum: Long)

  /** `exif_strip`: scrub-then-verify in one map — strip the metadata
    * segments, re-parse to PROVE no EXIF survives, and decode the stripped
    * payload to prove the pixel plane is untouched (width/height/rolling
    * checksum — graded against the JPEG plane oracle). Map-only.
    */
  def exifStrip(withBinary: DataFrame, idCol: String = "doc_id",
                binCol: String = "payload"): Dataset[ExifStrip] = {
    val spark = withBinary.sparkSession
    import spark.implicits._
    withBinary
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytesOrNull) =>
        try {
          val bytes = Option(bytesOrNull).getOrElse(Array.empty)
          val had = parseExif(id, bytes).has_exif
          val stripped = stripMetadata(bytes)
          val after = parseExif(id, stripped).has_exif
          Multimodal.parseJpeg(stripped).map { img =>
            var checksum = 0L
            var j = 0
            while (j < img.pixels.length) {
              checksum = (checksum * 31 + (img.pixels(j) & 0xff)) % 1000000007L
              j += 1
            }
            ExifStrip(id, had, after, img.width, img.height, checksum)
          }
        } catch { case _: MalformedExif => None }
      }
  }
}
