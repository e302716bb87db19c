package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DhashSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ppm(w: Int, h: Int)(pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixel(x, y)
      val base = header.length + 3 * (y * w + x)
      out(base) = r.toByte; out(base + 1) = g.toByte; out(base + 2) = b.toByte
    }
    out
  }

  private def hashOf(bytes: Array[Byte]): String = {
    import spark.implicits._
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
    Multimodal.dhashPpm(df).collect()(0).getString(1)
  }

  test("dhash is invariant to a global brightness shift (it compares, never measures)") {
    def grad(shift: Int) = ppm(16, 16)((x, y) => {
      val v = 30 + 6 * x + 3 * y + shift // stays < 256 after the +40 shift
      (v, v, v)
    })
    assert(hashOf(grad(0)) == hashOf(grad(40)))
    // ...but not to a structural change
    val structural = ppm(16, 16)((x, y) => {
      val v = if (x < 8) 200 else 30 + 6 * x + 3 * y
      (v, v, v)
    })
    assert(hashOf(structural) != hashOf(grad(0)))
  }

  test("dhash survives a resolution change of the same scene") {
    def scene(w: Int, h: Int) = ppm(w, h)((x, y) =>
      if ((x * 8 / w) % 2 == 0) (220, 220, 220) else (30, 30, 30))
    // the same vertical stripes at two sizes resample to the same 9x8 grid
    assert(hashOf(scene(16, 16)) == hashOf(scene(32, 24)))
  }

  test("pairs: identical images at Hamming 0; a tweaked copy nearby; noise unpaired") {
    import spark.implicits._
    val a = ppm(12, 12)((x, y) => (20 * (x % 8), 10 * y, 40))
    val aTweak = a.clone(); aTweak(15) = (~aTweak(15)).toByte // one plane byte
    val noise = ppm(12, 12)((x, y) => ((x * 97 + y * 31) % 256, (x * 13) % 256, (y * 59) % 256))
    val df = Seq((1L, a), (2L, a.clone()), (3L, aTweak), (4L, noise)).toDF("doc_id", "payload")
    val pairs = Multimodal.dhashPairs(Multimodal.dhashPpm(df), maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3)
    assert(!pairs.keys.exists { case (p, q) => p == 4L || q == 4L })
  }

  test("block LSH is exact at maxHamming 3: equals brute force on crafted hashes") {
    import spark.implicits._
    def flipBits(hex: String, bits: Seq[Int]): String = {
      val v = BigInt(hex, 16) ^ bits.map(BigInt(1) << _).foldLeft(BigInt(0))(_ | _)
      ("%016X").format(v)
    }
    val base = "5AC3F00F12345678"
    val hashes = Seq(
      10L -> base,
      11L -> flipBits(base, Seq(0)), // ham 1 vs base
      12L -> flipBits(base, Seq(5, 21, 40)), // ham 3, spread over 3 blocks
      13L -> flipBits(base, Seq(1, 17, 33, 49)), // ham 4, one per block (beyond threshold)
      14L -> "0000000000000000").toDF("doc_id", "dhash")
    val got = Multimodal.dhashPairs(hashes, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    def ham(a: String, b: String) = (BigInt(a, 16) ^ BigInt(b, 16)).bitCount
    val rows = hashes.collect().map(r => r.getLong(0) -> r.getString(1))
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib && ham(ha, hb) <= 3
    } yield (ia, ib) -> ham(ha, hb)).toMap
    assert(got == brute)
    assert(got.contains((10L, 12L)) && !got.contains((10L, 13L)))
  }

  test("malformed payloads drop from the hash relation") {
    import spark.implicits._
    val df = Seq((1L, "not a ppm".getBytes("UTF-8")), (2L, ppm(9, 9)((_, _) => (1, 2, 3))))
      .toDF("doc_id", "payload")
    val got = Multimodal.dhashPpm(df).collect()
    assert(got.length == 1 && got(0).getLong(0) == 2L)
  }
}
