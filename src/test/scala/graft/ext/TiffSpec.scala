package graft.ext

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The from-scratch baseline-TIFF codec, differentialed against the
  * JDK's ImageIO TIFF plugin (JDK 9+) in both directions: our writer's
  * files decode there pixel-exactly across endians/compressions/strip
  * layouts, and ImageIO-written none/PackBits/LZW files decode here.
  */
class TiffSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def imageioPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val p = 3 * (y * w + x)
          out(p) = ((rgb >> 16) & 0xff).toByte
          out(p + 1) = ((rgb >> 8) & 0xff).toByte
          out(p + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    }
  }

  private def imageioWriteTiff(w: Int, h: Int, plane: Array[Byte], compression: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = 3 * (y * w + x)
        img.setRGB(x, y, ((plane(p) & 0xff) << 16) | ((plane(p + 1) & 0xff) << 8) | (plane(p + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    if (compression != null) {
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionType(compression)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  // ---------------------------------------------------------- PackBits

  test("PackBits: round trip, literal/replicate boundaries, -128 noop, damage") {
    val rnd = new scala.util.Random(1)
    for (t <- 0 until 200) {
      val n = rnd.nextInt(400)
      val d =
        if (t % 2 == 0) Array.fill(n)(rnd.nextInt(4).toByte) // runs
        else Array.fill(n)(rnd.nextInt(256).toByte)
      val enc = Tiff.packBitsEncode(d)
      assert(Tiff.packBitsDecode(enc, n).exists(_.sameElements(d)), s"t=$t n=$n")
    }
    // 128+-byte runs split correctly
    val big = Array.fill(700)(7.toByte)
    assert(Tiff.packBitsDecode(Tiff.packBitsEncode(big), 700).exists(_.sameElements(big)))
    // -128 is a noop the decoder must skip
    assert(Tiff.packBitsDecode(Array[Byte](-128, 0, 'a'), 1).exists(_.sameElements(Array('a'.toByte))))
    // truncated input / wrong expected size fail cleanly
    assert(Tiff.packBitsDecode(Array[Byte](5), 6).isEmpty)
    assert(Tiff.packBitsDecode(Tiff.packBitsEncode(big), 699).isEmpty)
  }

  // --------------------------------------------------------- TIFF LZW

  test("TIFF LZW: round trip across shapes incl. table-reset streams") {
    val rnd = new scala.util.Random(2)
    for (t <- 0 until 100) {
      val n = rnd.nextInt(5000)
      val d = (t % 4) match {
        case 0 => Array.fill(n)(rnd.nextInt(256).toByte)
        case 1 => Array.fill(n)(rnd.nextInt(3).toByte)
        case 2 => Array.fill(n)('x'.toByte)
        case _ => Array.tabulate(n)(i => (i % 17).toByte)
      }
      assert(Tiff.lzwDecode(Tiff.lzwEncode(d), n).exists(_.sameElements(d)), s"t=$t n=$n")
    }
    // long low-entropy input forces width growth through 10/11/12 bits
    // and a table reset (> 4094 entries)
    val long = Array.tabulate(120000)(i => ((i * 31) % 199).toByte)
    assert(Tiff.lzwDecode(Tiff.lzwEncode(long), long.length).exists(_.sameElements(long)))
  }

  // ------------------------------------------------- container + gates

  private def fixtureDocs(n: Long) = {
    import spark.implicits._
    (0L until n).map(i => (i, s"tiff body $i " + ("w" * (i % 23).toInt))).toDF("doc_id", "text")
  }

  test("writer differential: ImageIO decodes our fixtures pixel-exactly across all arms") {
    import spark.implicits._
    val rows = Tiff.encodeTiff(fixtureDocs(48)).select("doc_id", "payload")
      .as[(Long, Array[Byte])].collect()
    rows.foreach { case (id, payload) =>
      val mine = Tiff.parseTiff(payload).getOrElse(fail(s"our parse failed on doc $id"))
      val (w, h, ref) = imageioPixels(payload).getOrElse(fail(s"ImageIO rejected doc $id"))
      assert(w == mine.width && h == mine.height, s"doc $id dims")
      assert(ref.sameElements(mine.pixels), s"doc $id pixels (endian=${id % 2} comp=${id % 3})")
    }
  }

  test("reader differential: ImageIO-written none/PackBits/LZW files decode here") {
    val rnd = new scala.util.Random(3)
    for ((comp, t) <- Seq(null, "PackBits", "LZW").zipWithIndex; trial <- 0 until 3) {
      val w = 5 + rnd.nextInt(40)
      val h = 3 + rnd.nextInt(40)
      val plane = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val bytes = imageioWriteTiff(w, h, plane, comp)
      val mine = Tiff.parseTiff(bytes)
      assert(mine.isDefined, s"comp=$comp trial=$trial: our parser rejected an ImageIO file")
      assert(mine.get.width == w && mine.get.height == h)
      assert(mine.get.pixels.sameElements(plane), s"comp=$comp trial=$trial pixels")
    }
  }

  test("tiffFeatures: byte model holds across endian/compression/strip arms; malformed drops") {
    import spark.implicits._
    val docs = fixtureDocs(64)
    val feats = Tiff.tiffFeatures(Tiff.encodeTiff(docs)).collect().map(f => f.doc_id -> f).toMap
    assert(feats.size == 64)
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val data = text.getBytes("UTF-8")
      val w = 8 + (id % 8).toInt
      val h = 8 + ((id / 8) % 8).toInt
      var r = 0L; var g = 0L; var b = 0L; var cs = 0L
      var j = 0
      while (j < 3 * w * h) {
        val v = data((j % data.length)) & 0xff
        (j % 3) match { case 0 => r += v; case 1 => g += v; case _ => b += v }
        cs = (cs * 31 + v) % 1000000007L
        j += 1
      }
      val f = feats(id)
      assert(f.width == w && f.height == h && f.sum_r == r && f.sum_g == g && f.sum_b == b &&
        f.checksum == cs, s"doc $id")
    }
    // malformed payloads drop, never crash; a tampered IFD entry (doc 3)
    // may legitimately still parse if it hits an ignored tag, so only
    // the clearly-broken payloads are asserted out
    val junk = Seq(
      (0L, Array.emptyByteArray),
      (1L, "II*".getBytes),
      (2L, Array.fill[Byte](64)(0x49)),
      (3L, { val p = Tiff.encodeTiff(fixtureDocs(1)).select("payload").as[Array[Byte]].first()
             val m = p.clone(); m(m.length - 10) = (m(m.length - 10) ^ 0x7f).toByte; m })).toDF("doc_id", "payload")
    val surviving = Tiff.tiffFeatures(junk).collect().map(_.doc_id).toSet
    assert(!surviving.contains(0L) && !surviving.contains(1L) && !surviving.contains(2L), surviving)
  }

  test("hostile dims: a ~150-byte 2^14 x 2^14 header drops WITHOUT the 768 MB allocation") {
    // Structurally valid LE header that passes every pre-allocation check
    // (dims, photometric, bps, strips) so only the 3L*w*h > 1<<26 bomb cap
    // can reject it before the output allocation.
    val buf = java.nio.ByteBuffer.allocate(160).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    buf.putShort(10) // entry count
    def entry(tag: Int, typ: Int, cnt: Int, value: Long): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3) { buf.putShort(value.toInt.toShort); buf.putShort(0) }
      else buf.putInt(value.toInt)
    }
    val bpsOff = 8 + 2 + 12 * 10 + 4 // three SHORT 8s live right after nextIFD
    entry(256, 3, 1, 16384) // width
    entry(257, 3, 1, 16384) // height
    entry(258, 3, 3, bpsOff)
    entry(259, 3, 1, 1) // compression = none
    entry(262, 3, 1, 2) // photometric = RGB
    entry(273, 4, 1, bpsOff + 6) // one strip, points into the buffer
    entry(277, 3, 1, 3) // samples
    entry(278, 4, 1, 16384) // rows per strip = h -> nStrips = 1
    entry(279, 4, 1, 4) // strip byte count (tiny, in-bounds)
    entry(284, 3, 1, 1) // planar
    buf.putInt(0) // next IFD
    buf.putShort(8).putShort(8).putShort(8) // bps values
    buf.putInt(0) // strip bytes
    val bomb = java.util.Arrays.copyOf(buf.array(), buf.position())
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val before = tmx.getThreadAllocatedBytes(tid)
    (0 until 16).foreach(_ => assert(Tiff.parseTiff(bomb).isEmpty))
    val allocated = tmx.getThreadAllocatedBytes(tid) - before
    // 16 parses of a 768 MB-declaring bomb must not allocate even one output
    // plane (pre-cap behavior would be >= 12 GB here)
    assert(allocated < (8L << 20), s"allocated $allocated bytes across 16 bomb parses")
  }
}
