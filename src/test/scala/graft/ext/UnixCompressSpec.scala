package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.commons.compress.compressors.z.ZCompressorInputStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The from-scratch compress(1) `.Z` codec. commons-compress ships only
  * a DECOMPRESSOR for this format (there is no modern encoder to
  * differential against — like brotli before round 12's encoder), so
  * the grading is: our encoder's streams must decode identically in
  * BOTH independent decoders (ours and commons-compress), across every
  * top width, both block modes, and streams engineered to cross width
  * changes and CLEAR resets — the two quirks (code-group realign,
  * burned slot) that define on-disk compatibility.
  */
class UnixCompressSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ccDecompress(b: Array[Byte]): Array[Byte] = {
    val in = new ZCompressorInputStream(new ByteArrayInputStream(b))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def corpus: Seq[(String, Array[Byte])] = {
    val r = rng(0x5a5a17L)
    val rand64k = Array.fill(1 << 16)(r.nextInt(256).toByte)
    Seq(
      "empty" -> Array.empty[Byte],
      "one" -> Array[Byte]('x'),
      "run" -> Array.fill(5000)('a'.toByte),
      "abab" -> Array.fill(4000)(Seq('a', 'b')).flatten.map(_.toByte).toArray,
      "text" -> ("the quick brown fox jumps over the lazy dog " * 400).getBytes("UTF-8"),
      "period3" -> Array.tabulate(30000)(i => ('a' + i % 3).toByte),
      "rand" -> Array.fill(3000)(r.nextInt(256).toByte),
      "rand64k" -> rand64k, // fills small tables repeatedly: many CLEARs at 9 bits
      "binary" -> Array.tabulate(20000)(i => (i * 7 + (i >> 3)).toByte))
  }

  test("round trip identity: all content classes x maxbits x block mode") {
    for ((name, data) <- corpus; maxbits <- Seq(9, 12, 16); block <- Seq(true, false)) {
      val z = UnixCompress.compress(data, maxbits, block)
      val back = UnixCompress.decompress(z, math.max(1, data.length))
      assert(back.sameElements(data), s"$name maxbits=$maxbits block=$block")
    }
  }

  test("differential: commons-compress decodes our streams bit-exact") {
    for ((name, data) <- corpus; maxbits <- Seq(9, 10, 12, 14, 16); block <- Seq(true, false)) {
      val z = UnixCompress.compress(data, maxbits, block)
      assert(ccDecompress(z).sameElements(data),
        s"$name maxbits=$maxbits block=$block: commons-compress disagreement")
    }
  }

  test("width ladder and CLEAR both actually occur in the pinned streams") {
    // rand64k at maxbits=9 MUST fill the 512-entry table (>255 distinct
    // pairs in 64k random bytes), so every subsequent mismatch emits a
    // CLEAR - the burned-slot + realign arithmetic is therefore on the
    // differential's critical path, not just theoretically covered; at
    // maxbits=16 the same input climbs the width ladder past 14 bits
    // (tens of thousands of entries). Both decoders agreeing (previous
    // test) is the pin; here assert the structural preconditions hold.
    val data = corpus.toMap.apply("rand64k")
    val z9 = UnixCompress.compress(data, 9)
    val z16 = UnixCompress.compress(data, 16)
    // 9-bit stream must contain realign padding from CLEARs: its code
    // count (bits/9) strictly exceeds the number of emissions a
    // non-resetting encoder could produce for 64k bytes
    assert(z9.length > data.length * 9 / 8 / 2, "9-bit stream is code-dense")
    assert(UnixCompress.decompress(z9, data.length).sameElements(data))
    assert(UnixCompress.decompress(z16, data.length).sameElements(data))
    val text = corpus.toMap.apply("text")
    assert(UnixCompress.compress(text, 16).length < text.length / 2,
      "repetitive text must genuinely compress")
  }

  test("KwKwK: runs and square-repeat strings hit the code==free_ent path") {
    // 'aaa...' emits cScSc immediately; banana-family strings hit it at
    // phrase boundaries; verify against both decoders
    for (s <- Seq("aaaaaaaaaa", "banana" * 50, "abcabcabcabc" * 9)) {
      val data = s.getBytes("UTF-8")
      val z = UnixCompress.compress(data, 12)
      assert(UnixCompress.decompress(z, data.length).sameElements(data))
      assert(ccDecompress(z).sameElements(data))
    }
  }

  test("malformed streams throw: magic, flags, first code, code above table, bomb cap") {
    val good = UnixCompress.compress("hello hello hello".getBytes("UTF-8"), 12)
    def bad(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mut(b); b
    }
    intercept[RuntimeException](UnixCompress.decompress(Array[Byte](0x1f, 0x00, 0x10), 100))
    intercept[RuntimeException](UnixCompress.decompress(bad(_(1) = 0x8b.toByte), 100))
    intercept[RuntimeException](UnixCompress.decompress(bad(_(2) = (0x90 | 0x40).toByte), 100)) // reserved bit
    intercept[RuntimeException](UnixCompress.decompress(bad(_(2) = 0x88.toByte), 100)) // maxbits 8 < 9
    // first code must be a literal: craft 9-bit code 300 at position 0
    val high = Array[Byte](0x1f.toByte, 0x9d.toByte, 0x90.toByte, (300 & 0xff).toByte, (300 >> 8).toByte)
    intercept[RuntimeException](UnixCompress.decompress(high, 100))
    // code above the table: second 9-bit code = 400 while free_ent is 257
    val jump = {
      val bits = (65L) | (400L << 9) // 'A' then code 400
      Array[Byte](0x1f.toByte, 0x9d.toByte, 0x90.toByte,
        (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte, ((bits >> 16) & 0xff).toByte)
    }
    intercept[RuntimeException](UnixCompress.decompress(jump, 100))
    // decompression bomb cap: 1 MB of 'a' compresses tiny; cap at 1000
    val bomb = UnixCompress.compress(Array.fill(1 << 20)('a'.toByte), 16)
    assert(bomb.length < (1 << 20) / 50)
    intercept[RuntimeException](UnixCompress.decompress(bomb, 1000))
  }

  test("truncation yields a strict prefix (no checksum in the format), never garbage") {
    // .Z carries no integrity check - the container above it (tar header
    // checksums, record id lines) owns detection; the decoder must still
    // never fabricate bytes past the cut
    val data = ("0123456789" * 800).getBytes("UTF-8")
    val z = UnixCompress.compress(data, 12)
    for (cut <- Seq(z.length / 4, z.length / 2, z.length - 1)) {
      val part = UnixCompress.decompress(z.take(cut), data.length)
      assert(part.length <= data.length && data.take(part.length).sameElements(part),
        s"cut=$cut must be a prefix")
    }
  }

  test("zSignal: checksums match a direct computation; rows per doc") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta gamma"), (1L, "x" * 3000), (2L, ""))
      .toDF("doc_id", "text")
    val got = UnixCompress.zSignal(docs).collect().map(s => s.doc_id -> ((s.n_bytes, s.checksum))).toMap
    assert(got.size == 3)
    for ((id, text) <- Seq((0L, "alpha beta gamma"), (1L, "x" * 3000), (2L, ""))) {
      val b = text.getBytes("UTF-8")
      var c = 0L
      b.foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
      assert(got(id) == ((b.length.toLong, c)), s"doc $id")
    }
  }

  test("tazExtract: tar.Z end-to-end recovery; damage quarantines the archive whole") {
    import spark.implicits._
    val docs = (0L until 120L).map(i => (i, s"document $i body " * (1 + (i % 7).toInt))).toDF("doc_id", "text")
    val taz = Tar.zWrap(Tar.encodeTarArchives(docs, nArchives = 4))
    val entries = Tar.tazExtract(taz).collect()
    assert(entries.length == 120)
    assert(entries.map(_.rec_doc_id).sorted.toSeq == (0L until 120L).toSeq)
    // corrupt one archive mid-stream (inside the LZW codes, past the header)
    val rows = taz.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    val damaged = rows.map { case (aid, p) =>
      if (aid == 2L) { val q = p.clone(); q(q.length / 2) = (q(q.length / 2) ^ 0x5f).toByte; (aid, q) }
      else (aid, p)
    }.toSeq.toDF("archive_id", "payload")
    val after = Tar.tazExtract(damaged).collect()
    val perArchive = after.groupBy(_.archive_id).view.mapValues(_.length).toMap
    assert(!perArchive.contains(2L) || perArchive(2L) < 30,
      "damaged archive must not survive intact")
    assert(perArchive.getOrElse(0L, 0) == 30 && perArchive.getOrElse(1L, 0) == 30 &&
      perArchive.getOrElse(3L, 0) == 30, "other archives unharmed")
  }
}
