package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BitPackSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("pack/unpack: exact wire bytes for a known block, round-trips on random data") {
    // deltas [5, 0, 7] at width 3, LSB-first: bits 101 000 111 -> byte0 =
    // 1,0,1,0,0,0,1,1 (LSB first) = 0xC5, byte1 = 1 = 0x01
    assert(BitPack.pack(Array(5L, 0L, 7L), 3).toSeq == Seq(0xc5.toByte, 0x01.toByte))
    assert(BitPack.unpack(Array(0xc5.toByte, 0x01.toByte), 3, 3).toSeq == Seq(5L, 0L, 7L))
    val rnd = new scala.util.Random(2)
    (0 until 30).foreach { _ =>
      val w = rnd.nextInt(64) + 1
      val lim = if (w == 64) Long.MaxValue else (1L << w) - 1
      val vs = Array.fill(rnd.nextInt(200) + 1)((rnd.nextLong() & Long.MaxValue) % (lim max 1))
      val bytes = BitPack.pack(vs, w)
      assert(bytes.length == (vs.length * w + 7) / 8, "canonical length")
      assert(BitPack.unpack(bytes, vs.length, w).toSeq == vs.toSeq)
    }
  }

  test("widthFor: exact bit boundaries; zero-delta blocks pack to zero bytes") {
    assert(BitPack.widthFor(0L) == 0)
    assert(BitPack.widthFor(1L) == 1)
    assert(BitPack.widthFor(255L) == 8)
    assert(BitPack.widthFor(256L) == 9)
    assert(BitPack.widthFor(Long.MaxValue) == 63)
    assert(BitPack.pack(Array(0L, 0L, 0L), 0).length == 0)
    assert(BitPack.unpack(Array.emptyByteArray, 3, 0).toSeq == Seq(0L, 0L, 0L))
  }

  test("packedBlocks: block stats, constant blocks at width 0, checksum = ordered fold") {
    import spark.implicits._
    // bucket 0: keys 0,64,128,... constant value; bucket 1: keys 1,65,... ramp
    val rows = (0 until 300).map { i =>
      val key = i.toLong
      val v = if (key % 64 == 0L) 42L else 1000L + key
      (key, 0L, v)
    }
    val df = rows.toDF("k1", "k2", "v")
    val out = BitPack.packedBlocks(df, Seq("k1", "k2"), "v", nBuckets = 64, blockSize = 2)
      .collect().map(b => (b.bucket, b.block_id) -> b).toMap
    // bucket 0 holds keys 0,64,128,192,256 (5 values, all 42) -> blocks of 2,2,1, width 0
    val b0 = (0L to 2L).map(i => out((0L, i)))
    assert(b0.map(_.n_vals) == Seq(2L, 2L, 1L))
    assert(b0.forall(b => b.width == 0L && b.n_bytes == 0L && b.minv == 42L && b.maxv == 42L))
    def fold(vs: Seq[Long]): Long = vs.foldLeft(0L)((a, x) => (a * 31 + x % 1000000007L) % 1000000007L)
    assert(b0.head.checksum == fold(Seq(42L, 42L)))
    // bucket 1 holds keys 1,65,129,193,257 -> values 1001,1065,...: width of (max-min) per block
    val b1 = out((1L, 0L)) // values 1001, 1065 -> delta 64 -> width 7, 2 vals -> 2 bytes
    assert(b1.minv == 1001L && b1.maxv == 1065L && b1.width == 7L && b1.n_bytes == 2L)
    assert(b1.checksum == fold(Seq(1001L, 1065L)))
  }

  test("packedBlocks: duplicate key pairs stay deterministic via the value tie-break") {
    import spark.implicits._
    // three rows share (k1, k2) with DIFFERENT values: only a value-aware
    // order makes block membership well-defined across partitionings
    val rows = Seq((0L, 1L, 30L), (0L, 1L, 10L), (0L, 1L, 20L), (0L, 2L, 5L))
    val df = rows.toDF("k1", "k2", "v")
    val out = BitPack.packedBlocks(df, Seq("k1", "k2"), "v", nBuckets = 4, blockSize = 2)
      .collect().map(b => (b.block_id, (b.n_vals, b.minv, b.maxv, b.checksum))).toMap
    def fold(vs: Seq[Long]): Long = vs.foldLeft(0L)((a, x) => (a * 31 + x % 1000000007L) % 1000000007L)
    // ordered values: 10, 20, 30, 5 -> blocks [10,20], [30,5]
    assert(out(0L) == ((2L, 10L, 20L, fold(Seq(10L, 20L)))))
    assert(out(1L) == ((2L, 5L, 30L, fold(Seq(30L, 5L)))))
    val again = BitPack.packedBlocks(df.repartition(5), Seq("k1", "k2"), "v", nBuckets = 4, blockSize = 2)
      .collect().map(b => (b.block_id, (b.n_vals, b.minv, b.maxv, b.checksum))).toMap
    assert(again == out)
  }

  test("packedBlocks: partition-invariant and total over the input") {
    import spark.implicits._
    val rnd = new scala.util.Random(8)
    val rows = (0 until 5000).map(i => (rnd.nextInt(1000).toLong, i.toLong, (rnd.nextLong() & Long.MaxValue) % 100000))
    val df = rows.toDF("k1", "k2", "v")
    val a = BitPack.packedBlocks(df, Seq("k1", "k2"), "v").collect().map(b => (b.bucket, b.block_id, b.checksum)).sorted.toSeq
    val b = BitPack.packedBlocks(df.repartition(17), Seq("k1", "k2"), "v").collect().map(x => (x.bucket, x.block_id, x.checksum)).sorted.toSeq
    assert(a == b)
    val total = BitPack.packedBlocks(df, Seq("k1", "k2"), "v").collect().map(_.n_vals).sum
    assert(total == 5000L)
  }
}
