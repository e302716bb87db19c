package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class Lz4Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val factory = net.jpountz.lz4.LZ4Factory.fastestInstance()

  private val payloads: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(41)
    Seq(
      "empty" -> Array.emptyByteArray,
      "below margin" -> "twelve bytes".getBytes("UTF-8"), // n = 12: literals only
      "margin + 1" -> "thirteen bytes".getBytes("UTF-8"),
      "repetitive text" -> ("the quick brown fox " * 400).getBytes("UTF-8"),
      "all equal" -> Array.fill(10000)(5.toByte), // offset-1 RLE matches
      "random" -> Array.fill(5000)(rnd.nextInt(256).toByte), // >15 literal runs
      "long match" -> (Array.fill(50)(rnd.nextInt(256).toByte) ++
        Array.fill(3000)(9.toByte)), // match-length extension bytes
      "long-range" -> {
        val a = Array.fill(80000)(rnd.nextInt(256).toByte)
        System.arraycopy(a, 0, a, 65000, 10000) // offsets near the 64 KiB cap
        a
      })
  }

  test("lz4: round trip through our own coder on every payload shape") {
    payloads.foreach { case (name, data) =>
      val back = Lz4.decompress(Lz4.compress(data), data.length)
      assert(back.toSeq == data.toSeq, name)
    }
  }

  test("lz4 differential: production lz4-java decodes our streams") {
    payloads.foreach { case (name, data) =>
      val comp = Lz4.compress(data)
      val back = new Array[Byte](data.length)
      factory.safeDecompressor().decompress(comp, 0, comp.length, back, 0)
      assert(back.toSeq == data.toSeq, s"$name: jpountz decode of our stream")
    }
  }

  test("lz4 differential: we decode production lz4-java streams") {
    payloads.foreach { case (name, data) =>
      val comp = factory.fastCompressor().compress(data)
      val back = Lz4.decompress(comp, data.length)
      assert(back.toSeq == data.toSeq, s"$name: our decode of jpountz stream")
    }
  }

  test("lz4: malformed streams throw, never corrupt or overrun") {
    def bad(bytes: Array[Byte], outLen: Int): Boolean =
      try { Lz4.decompress(bytes, outLen); false }
      catch { case _: RuntimeException => true }
    val data = "a perfectly reasonable payload with repetition repetition repetition".getBytes("UTF-8")
    val good = Lz4.compress(data)
    assert(!bad(good, data.length))
    assert(bad(good, data.length - 1), "short declared size")
    assert(bad(good, data.length + 1), "long declared size")
    assert(bad(good.dropRight(1), data.length), "truncated stream")
    // a stream ending after the literals IS the legal final sequence; a
    // HALF-written offset after them is not
    assert(!bad(Array[Byte](0x10, 'x'), 1), "literals-only final sequence is legal")
    assert(bad(Array[Byte](0x10, 'x', 0x05), 1), "truncated offset after literals")
    // a copy reaching before the stream start
    assert(bad(Array[Byte](0x00, 9, 0, 0), 4), "copy before start")
    // a match length accumulated to ~Int.MaxValue so that the +4 overflows
    // Int — must throw, not silently skip the copy loop
    val overflow = new java.io.ByteArrayOutputStream()
    overflow.write(0x1f) // 1 literal, matchLen base 15
    overflow.write('x')
    overflow.write(0x01); overflow.write(0x00) // offset 1
    var rem = Int.MaxValue - 3 - 15 // target len = Int.MaxValue - 3, so len + 4 < 0
    while (rem >= 255) { overflow.write(0xff); rem -= 255 }
    overflow.write(rem)
    assert(bad(overflow.toByteArray, 1), "match length Int overflow")
  }

  test("lz4Signal over Spark: decoded stats match the source") {
    import spark.implicits._
    val docs = Seq((0L, "lz4 block " * 500), (1L, "y"), (2L, "")).toDF("doc_id", "text")
    val sig = Lz4.lz4Signal(docs).collect().map(s => s.doc_id -> s).toMap
    assert(sig(0L).n_bytes == 5000 && sig(0L).ratio < 0.1)
    assert(sig(1L).n_bytes == 1 && sig(1L).checksum == 'y'.toLong)
    assert(sig(2L).n_bytes == 0 && sig(2L).checksum == 0L)
  }
}
