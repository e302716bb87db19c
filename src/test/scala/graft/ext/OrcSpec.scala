package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class OrcSpec extends AnyFunSuite {

  private def checksum(s: String): Long = {
    var ck = 0L
    s.getBytes("UTF-8").foreach(x => ck = (ck * 31 + (x & 0xff)) % 1000000007L)
    ck
  }

  test("RLEv2 known-answer vectors from the published ORC spec") {
    // SHORT_REPEAT: [10000 x5] (unsigned)
    assert(Orc.decodeRleV2(Array(0x0a, 0x27, 0x10).map(_.toByte), signed = false, 5)
      .toSeq == Seq.fill(5)(10000L))
    // DIRECT: [23713, 43806, 57005, 48879] (unsigned, 16-bit packed)
    assert(Orc.decodeRleV2(Array(0x5e, 0x03, 0x5c, 0xa1, 0xab, 0x1e, 0xde, 0xad, 0xbe, 0xef)
      .map(_.toByte), signed = false, 4).toSeq == Seq(23713L, 43806L, 57005L, 48879L))
    // DELTA: the primes [2,3,5,7,11,13,17,19,23,29] (unsigned)
    assert(Orc.decodeRleV2(Array(0xc6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46)
      .map(_.toByte), signed = false, 10)
      .toSeq == Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L, 29L))
  }

  test("RLEv2 writer arms round-trip through the reader (signed + unsigned)") {
    def rt(build: java.io.ByteArrayOutputStream => Unit, signed: Boolean, n: Int): Seq[Long] = {
      val o = new java.io.ByteArrayOutputStream()
      build(o)
      Orc.decodeRleV2(o.toByteArray, signed, n).toSeq
    }
    assert(rt(Orc.rleShortRepeat(_, -6L, 7, signed = true), signed = true, 7) == Seq.fill(7)(-6L))
    assert(rt(Orc.rleShortRepeat(_, 0L, 3, signed = true), signed = true, 3) == Seq.fill(3)(0L))
    val vals = Array(-3L, 0L, 1L, 255L, -1024L, 77L)
    assert(rt(Orc.rleDirect(_, vals, signed = true), signed = true, 6) == vals.toSeq)
    val lens = Array(17L, 1L, 0L, 511L)
    assert(rt(Orc.rleDirect(_, lens, signed = false), signed = false, 4) == lens.toSeq)
    assert(rt(Orc.rleFixedDelta(_, 500L, 1L, 6, signed = true), signed = true, 6) ==
      (500L to 505L))
    assert(rt(Orc.rleFixedDelta(_, -10L, -7L, 4, signed = true), signed = true, 4) ==
      Seq(-10L, -17L, -24L, -31L))
  }

  test("round-trip: stripe walk + decode recover the closed-form aggregates") {
    var twoStripes = false
    var negCat = false
    for (id <- 0L until 96L) {
      val rows = Orc.parseOrc(id, Orc.renderOrc(id))
      val n = Orc.nRows(id)
      val nStripes = (n + 2) / 3
      if (nStripes > 1) twoStripes = true
      if (Orc.catVal(id) < 0) negCat = true
      assert(rows.length == 4 * nStripes, s"orc $id column-row count")
      for (g <- 0 until nStripes) {
        val ks = (3 * g) until math.min(3 * g + 3, n)
        val byCol = rows.filter(_.stripe == g).map(r => r.col_idx -> r).toMap
        val c1 = byCol(1L)
        assert(c1.name == "id" && c1.ctype == "LONG" && c1.enc == "DIRECT_V2")
        assert(c1.n_vals == ks.length && c1.vtype == "i" &&
          c1.i_sum.contains(ks.map(Orc.idVal(id, _)).sum), s"orc $id s$g ids")
        val c2 = byCol(2L)
        assert(c2.name == "title" && c2.ctype == "STRING" && c2.vtype == "s")
        val cat = ks.map(Orc.titleVal(id, _)).mkString("")
        assert(c2.s_bytes.contains(cat.getBytes("UTF-8").length.toLong) &&
          c2.s_checksum.contains(checksum(cat)), s"orc $id s$g titles")
        val c3 = byCol(3L)
        assert(c3.name == "score" && c3.ctype == "DOUBLE" && c3.enc == "DIRECT")
        assert(c3.r_sum.contains(ks.map(Orc.scoreVal(id, _)).sum), s"orc $id s$g scores")
        val c4 = byCol(4L)
        assert(c4.name == "cat" && c4.ctype == "LONG" && c4.vtype == "i")
        assert(c4.i_sum.contains(Orc.catVal(id) * ks.length), s"orc $id s$g cat")
      }
    }
    assert(twoStripes, "multi-stripe files occur")
    assert(negCat, "negative constants occur (signed SHORT_REPEAT graded)")
  }

  test("SPARK (orc-core underneath) reads the from-scratch files: exact rows, exact types") {
    val spark = graft.SparkSpec.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_orcw").toFile
    try {
      val ids = Seq(0L, 1L, 5L, 17L)
      ids.foreach { id =>
        java.nio.file.Files.write(
          new java.io.File(dir, s"part-$id.orc").toPath, Orc.renderOrc(id))
      }
      val df = spark.read.orc(dir.getAbsolutePath)
      val sch = df.schema
      assert(sch("id").dataType == org.apache.spark.sql.types.LongType)
      assert(sch("title").dataType == org.apache.spark.sql.types.StringType)
      assert(sch("score").dataType == org.apache.spark.sql.types.DoubleType)
      assert(sch("cat").dataType == org.apache.spark.sql.types.LongType)
      val got = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
      val expected = ids.flatMap { id =>
        (0 until Orc.nRows(id)).map(k =>
          (Orc.idVal(id, k), Orc.titleVal(id, k), Orc.scoreVal(id, k), Orc.catVal(id)))
      }.toSet
      assert(got == expected, "Spark must decode exactly the fixture rows")
    } finally {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("foreign differential: the footer walk agrees with orc-core's Reader on our files") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft_orcr").toFile
    try {
      for (id <- Seq(2L, 9L)) {
        val f = new java.io.File(dir, s"f$id.orc")
        java.nio.file.Files.write(f.toPath, Orc.renderOrc(id))
        val reader = org.apache.orc.OrcFile.createReader(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          org.apache.orc.OrcFile.readerOptions(conf))
        try {
          assert(reader.getNumberOfRows == Orc.nRows(id).toLong, s"orc $id rows")
          assert(reader.getCompressionKind.name() == "NONE")
          assert(reader.getSchema.toString ==
            "struct<id:bigint,title:string,score:double,cat:bigint>")
          val theirs = reader.getStripes.asScala.toSeq
          val ours = Orc.parseOrc(id, Orc.renderOrc(id))
          assert(theirs.length == ours.map(_.stripe).distinct.length, s"orc $id stripe count")
          theirs.zipWithIndex.foreach { case (s, g) =>
            assert(ours.filter(_.stripe == g).forall(_.n_vals == s.getNumberOfRows),
              s"orc $id stripe $g rows")
          }
        } finally reader.close()
      }
    } finally {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  /** Spark writes a real orc-core file; our reader must decode it
    * bit-exact — the strongest possible reader check, per codec.
    */
  private def sparkWrittenRoundTrip(codec: String, expectEnc: Option[String]): Unit = {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val n = 500
    // cat is engineered for PATCHED_BASE: a narrow body with huge
    // scattered outliers, non-monotonic so DELTA is off the table
    def cat(i: Int): Long =
      if (i % 97 == 3) (1L << 40) + i else ((i * 37) % 100).toLong
    def title(i: Int): String =
      if (expectEnc.contains("DICTIONARY_V2")) s"tag-${i % 7}" else s"title-$i-${i * 31}"
    val rows = (0 until n).map(i => (i.toLong * 3, title(i), i / 8.0, cat(i)))
    val dir = java.nio.file.Files.createTempDirectory(s"graft_orc_$codec").toFile
    try {
      rows.toDF("id", "title", "score", "cat").coalesce(1)
        .write.mode("overwrite").option("compression", codec).orc(dir.getAbsolutePath)
      val part = dir.listFiles().filter(_.getName.endsWith(".orc")).head
      val bytes = java.nio.file.Files.readAllBytes(part.toPath)
      val got = Orc.parseOrc(42L, bytes)
      assert(got.map(_.stripe).distinct == Seq(0L), "small data = one stripe")
      val byName = got.map(r => r.name -> r).toMap
      assert(byName("id").vtype == "i" && byName("id").i_sum.contains(rows.map(_._1).sum))
      assert(byName("cat").vtype == "i" && byName("cat").i_sum.contains(rows.map(_._4).sum),
        s"$codec: outlier column decodes (patched base path)")
      assert(byName("score").vtype == "f" &&
        math.abs(byName("score").r_sum.get - rows.map(_._3).sum) < 1e-9)
      val cats = rows.map(_._2).mkString("")
      assert(byName("title").vtype == "s" &&
        byName("title").s_bytes.contains(cats.getBytes("UTF-8").length.toLong) &&
        byName("title").s_checksum.contains(checksum(cats)), s"$codec: titles decode")
      expectEnc.foreach(e => assert(byName("title").enc == e, s"$codec: expected $e"))
      assert(got.forall(_.n_vals == n.toLong))
      if (codec == "none") {
        // prove orc-core actually chose PATCHED_BASE for the outlier column
        val catCol = got.find(_.name == "cat").get.col_idx.toInt
        val ds = Orc.dataStreamBytes(bytes, catCol)
        assert(((ds(0) & 0xff) >>> 6) == 2, "outlier column must be PATCHED_BASE")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("real orc-core files decode bit-exact: NONE codec, incl. a forced PATCHED_BASE column") {
    sparkWrittenRoundTrip("none", None)
  }
  test("real orc-core files decode bit-exact: SNAPPY chunk framing") {
    sparkWrittenRoundTrip("snappy", None)
  }
  test("real orc-core files decode bit-exact: ZLIB (raw-DEFLATE) chunk framing") {
    sparkWrittenRoundTrip("zlib", None)
  }
  test("real orc-core files decode bit-exact: DICTIONARY_V2 strings") {
    sparkWrittenRoundTrip("zlib", Some("DICTIONARY_V2"))
  }

  test("unsupported codec (zstd) quarantines cleanly — the footer itself is compressed") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_zstd").toFile
    try {
      (0 until 50).map(i => (i.toLong, s"t$i")).toDF("id", "title").coalesce(1)
        .write.mode("overwrite").option("compression", "zstd").orc(dir.getAbsolutePath)
      val part = dir.listFiles().filter(_.getName.endsWith(".orc")).head
      val bytes = java.nio.file.Files.readAllBytes(part.toPath)
      assert(Orc.parseOrcSafe(1L, bytes).isEmpty, "zstd is outside the codec subset")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("damage ladder: magic, postscript, footer bounds, truncation quarantine") {
    val id = 7L
    val good = Orc.renderOrc(id)
    assert(Orc.parseOrcSafe(id, good).nonEmpty)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Orc.parseOrcSafe(id, mut(0, 'X'.toByte)).isEmpty, "head magic")
    assert(Orc.parseOrcSafe(id, mut(good.length - 1, 0.toByte)).isEmpty, "psLen 0")
    assert(Orc.parseOrcSafe(id, mut(good.length - 1, 0xff.toByte)).isEmpty, "psLen overflow")
    assert(Orc.parseOrcSafe(id, good.take(20)).isEmpty, "truncation")
    assert(Orc.parseOrcSafe(id, Array.emptyByteArray).isEmpty)
    assert(Orc.parseOrcSafe(id, good.take(good.length - 1)).isEmpty, "lost trailer byte")
    // corrupt the postscript magic
    val psLen = good(good.length - 1) & 0xff
    val noMagic = good.clone()
    // the magic 'ORC' string sits inside the postscript; smash all of it
    for (i <- (good.length - 1 - psLen) until (good.length - 1)) noMagic(i) = 0x00.toByte
    assert(Orc.parseOrcSafe(id, noMagic).isEmpty, "postscript garbage")
  }

  test("operator: damaged file quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Orc.encodeOrc(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 4)) else (id, b)
    }.toDF("doc_id", "orc")
    val got = Orc.orcMeta(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    for (id <- (0L until 24L) if id != 8L) {
      val nStripes = (Orc.nRows(id) + 2) / 3
      assert(byDoc(id).length == 4 * nStripes, s"orc $id")
    }
  }
}
