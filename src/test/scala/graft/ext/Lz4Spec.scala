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

  test("xxHash32: matches the production implementation on every payload shape") {
    // lz4-java bundles the reference xxHash32 — the frame format's
    // checksum algorithm graded against it directly
    val xx = net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
    payloads.foreach { case (name, data) =>
      assert(Lz4.xxh32(data, 0, data.length, 0) == xx.hash(data, 0, data.length, 0), name)
      assert(Lz4.xxh32(data, 0, data.length, 0x9747b28c) ==
        xx.hash(data, 0, data.length, 0x9747b28c), s"$name seeded")
    }
  }

  test("lz4 frame: round trip + commons-compress reads our frames") {
    payloads.foreach { case (name, data) =>
      val frame = Lz4.frameCompress(data)
      val back = Lz4.frameDecompress(frame, 0, frame.length, data.length + 64)
      assert(back.toSeq == data.toSeq, s"$name round trip")
      // foreign decode: commons-compress FramedLZ4 (what arrow-java uses)
      val in = new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorInputStream(
        new java.io.ByteArrayInputStream(frame))
      val got = in.readAllBytes()
      in.close()
      assert(got.toSeq == data.toSeq, s"$name foreign decode")
    }
  }

  test("lz4 frame: we decode commons-compress frames (all header shapes)") {
    import org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream
    val params = Seq(
      FramedLZ4CompressorOutputStream.Parameters.DEFAULT,
      new FramedLZ4CompressorOutputStream.Parameters(
        FramedLZ4CompressorOutputStream.BlockSize.K64, true, true, true),
      new FramedLZ4CompressorOutputStream.Parameters(
        FramedLZ4CompressorOutputStream.BlockSize.M1, false, false, false))
    payloads.foreach { case (name, data) =>
      params.zipWithIndex.foreach { case (p, pi) =>
        val bos = new java.io.ByteArrayOutputStream()
        val out = new FramedLZ4CompressorOutputStream(bos, p)
        out.write(data); out.close()
        val frame = bos.toByteArray
        val back = Lz4.frameDecompress(frame, 0, frame.length, data.length + 64)
        assert(back.toSeq == data.toSeq, s"$name params $pi")
      }
    }
  }

  test("lz4 frame: damage quarantines — header checksum, content checksum, truncation") {
    val data = ("frame damage payload " * 50).getBytes("UTF-8")
    val good = Lz4.frameCompress(data)
    def decodes(b: Array[Byte]): Boolean =
      try { Lz4.frameDecompress(b, 0, b.length, data.length + 64); true }
      catch { case _: RuntimeException => false }
    assert(decodes(good))
    val badHc = good.clone(); badHc(6) = (badHc(6) ^ 0x5a).toByte
    assert(!decodes(badHc), "header checksum")
    val badCc = good.clone(); badCc(badCc.length - 1) = (badCc(badCc.length - 1) ^ 1).toByte
    assert(!decodes(badCc), "content checksum")
    assert(!decodes(good.take(good.length - 5)), "truncation")
    assert(!decodes(good ++ Array[Byte](0)), "trailing garbage")
    val badMagic = good.clone(); badMagic(0) = 0
    assert(!decodes(badMagic), "magic")
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
