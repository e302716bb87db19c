package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class ArrowSpec extends AnyFunSuite {

  private def checksum(s: String): Long = {
    var ck = 0L
    s.getBytes("UTF-8").foreach(x => ck = (ck * 31 + (x & 0xff)) % 1000000007L)
    ck
  }

  test("round-trip: batch walk + decode recover the closed-form aggregates") {
    var twoBatches = false
    var sawNull = false
    for (id <- 0L until 96L) {
      val rows = Arrow.parseArrow(id, Arrow.renderArrow(id))
      val n = Arrow.nRows(id)
      val nBatches = (n + 2) / 3
      if (nBatches > 1) twoBatches = true
      assert(rows.length == 5 * nBatches, s"arrow $id column-row count")
      for (g <- 0 until nBatches) {
        val ks = (3 * g) until math.min(3 * g + 3, n)
        val byCol = rows.filter(_.batch == g).map(r => r.col_idx -> r).toMap
        val c0 = byCol(0L)
        assert(c0.name == "id" && c0.ctype == "INT64" && !c0.nullable && c0.null_count == 0)
        assert(c0.n_rows == ks.length && c0.vtype == "i" &&
          c0.i_sum.contains(ks.map(Arrow.idVal(id, _)).sum), s"arrow $id b$g ids")
        val c1 = byCol(1L)
        assert(c1.name == "title" && c1.ctype == "UTF8" && c1.vtype == "s")
        val cat = ks.map(Arrow.titleVal(id, _)).mkString("")
        assert(c1.s_bytes.contains(cat.getBytes("UTF-8").length.toLong) &&
          c1.s_checksum.contains(checksum(cat)), s"arrow $id b$g titles")
        val c2 = byCol(2L)
        assert(c2.name == "score" && c2.ctype == "FLOAT64" && c2.vtype == "f")
        assert(c2.r_sum.contains(ks.map(Arrow.scoreVal(id, _)).sum), s"arrow $id b$g scores")
        val c3 = byCol(3L)
        assert(c3.name == "flag" && c3.ctype == "INT32" && c3.nullable && c3.vtype == "i")
        val nulls = ks.count(Arrow.flagIsNull(id, _))
        if (nulls > 0) sawNull = true
        assert(c3.null_count == nulls, s"arrow $id b$g null count")
        assert(c3.i_sum.contains(
          ks.filterNot(Arrow.flagIsNull(id, _)).map(Arrow.flagVal(id, _).toLong).sum),
          s"arrow $id b$g flags")
        // the dictionary-encoded column resolves through the decoded
        // dictionary batch — under whichever codec the file carries
        val c4 = byCol(4L)
        assert(c4.name == "tag" && c4.ctype == "UTF8" && c4.vtype == "s")
        val tcat = ks.map(Arrow.tagVal(id, _)).mkString("")
        assert(c4.s_bytes.contains(tcat.getBytes("UTF-8").length.toLong) &&
          c4.s_checksum.contains(checksum(tcat)), s"arrow $id b$g tags")
      }
    }
    assert(twoBatches, "multi-batch files occur")
    assert(sawNull, "null slots occur (validity bitmaps graded)")
    // all three compression arms occur across the sweep
    assert((0L until 96L).map(Arrow.compressionOf).toSet == Set(-1, 0, 1),
      "none/LZ4_FRAME/ZSTD files all occur")
  }

  test("ARROW-JAVA reads the from-scratch files: exact values, nulls, dictionary, codecs") {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      // ids cover all three compression arms: 0/6 none, 1/7 LZ4_FRAME, 5/17 ZSTD
      for (id <- Seq(0L, 1L, 5L, 6L, 7L, 17L)) {
        val bytes = Arrow.renderArrow(id)
        val ch = new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bytes)
        val reader = new org.apache.arrow.vector.ipc.ArrowFileReader(
          new org.apache.arrow.vector.ipc.SeekableReadChannel(ch), alloc,
          org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
        try {
          val root = reader.getVectorSchemaRoot
          val sch = root.getSchema
          assert(sch.getFields.size() == 5, s"arrow $id field count")
          assert(sch.getFields.get(0).getName == "id" && !sch.getFields.get(0).isNullable)
          assert(sch.getFields.get(3).getName == "flag" && sch.getFields.get(3).isNullable)
          assert(sch.getFields.get(4).getDictionary != null, s"arrow $id tag dict encoding")
          var k = 0
          while (reader.loadNextBatch()) {
            val idV = root.getVector("id").asInstanceOf[org.apache.arrow.vector.BigIntVector]
            val tV = root.getVector("title").asInstanceOf[org.apache.arrow.vector.VarCharVector]
            val sV = root.getVector("score").asInstanceOf[org.apache.arrow.vector.Float8Vector]
            val fV = root.getVector("flag").asInstanceOf[org.apache.arrow.vector.IntVector]
            val gV = root.getVector("tag").asInstanceOf[org.apache.arrow.vector.IntVector]
            val dict = reader.getDictionaryVectors.get(1L)
            assert(dict != null, s"arrow $id dictionary 1 loaded")
            val dictV = dict.getVector.asInstanceOf[org.apache.arrow.vector.VarCharVector]
            for (i <- 0 until root.getRowCount) {
              assert(idV.get(i) == Arrow.idVal(id, k), s"arrow $id row $k id")
              assert(new String(tV.get(i), "UTF-8") == Arrow.titleVal(id, k), s"arrow $id row $k title")
              assert(sV.get(i) == Arrow.scoreVal(id, k), s"arrow $id row $k score")
              if (Arrow.flagIsNull(id, k)) assert(fV.isNull(i), s"arrow $id row $k null")
              else assert(!fV.isNull(i) && fV.get(i) == Arrow.flagVal(id, k), s"arrow $id row $k flag")
              assert(new String(dictV.get(gV.get(i)), "UTF-8") == Arrow.tagVal(id, k),
                s"arrow $id row $k tag via dictionary")
              k += 1
            }
          }
          assert(k == Arrow.nRows(id), s"arrow $id total rows")
        } finally reader.close()
      }
    } finally alloc.close()
  }

  test("foreign differential: real arrow-java-written files decode bit-exact") {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo._
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import scala.jdk.CollectionConverters._

    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val schema = new Schema(Seq(
        new Field("a", FieldType.notNullable(new ArrowType.Int(64, true)), null),
        new Field("b", FieldType.nullable(new ArrowType.Utf8()), null),
        new Field("c", FieldType.nullable(new ArrowType.FloatingPoint(
          FloatingPointPrecision.DOUBLE)), null),
        new Field("d", FieldType.nullable(new ArrowType.Int(32, true)), null)).asJava)
      val root = VectorSchemaRoot.create(schema, alloc)
      val bos = new java.io.ByteArrayOutputStream()
      val writer = new org.apache.arrow.vector.ipc.ArrowFileWriter(
        root, null, java.nio.channels.Channels.newChannel(bos))
      writer.start()
      val batches = Seq(0 until 5, 5 until 12)
      def bVal(i: Int): Option[String] =
        if (i % 4 == 2) None else Some(s"s$i-${"x" * (i % 7)}é")
      def dVal(i: Int): Option[Int] = if (i % 5 == 0) None else Some(i * 31 - 170)
      batches.foreach { ks =>
        root.allocateNew()
        val aV = root.getVector("a").asInstanceOf[BigIntVector]
        val bV = root.getVector("b").asInstanceOf[VarCharVector]
        val cV = root.getVector("c").asInstanceOf[Float8Vector]
        val dV = root.getVector("d").asInstanceOf[IntVector]
        ks.zipWithIndex.foreach { case (i, j) =>
          aV.setSafe(j, i.toLong * 1000 - 7)
          bVal(i) match {
            case Some(s) => bV.setSafe(j, s.getBytes("UTF-8"))
            case None => bV.setNull(j)
          }
          cV.setSafe(j, i / 16.0)
          dVal(i) match {
            case Some(v) => dV.setSafe(j, v)
            case None => dV.setNull(j)
          }
        }
        root.setRowCount(ks.length)
        writer.writeBatch()
      }
      writer.end()
      writer.close()
      root.close()

      val got = Arrow.parseArrow(7L, bos.toByteArray)
      assert(got.map(_.batch).distinct.sorted == Seq(0L, 1L), "two batches surface")
      batches.zipWithIndex.foreach { case (ks, g) =>
        val byCol = got.filter(_.batch == g).map(r => r.name -> r).toMap
        assert(byCol("a").vtype == "i" &&
          byCol("a").i_sum.contains(ks.map(i => i.toLong * 1000 - 7).sum), s"b$g a")
        assert(byCol("a").null_count == 0 && !byCol("a").nullable)
        val cat = ks.flatMap(bVal).mkString("")
        assert(byCol("b").vtype == "s" &&
          byCol("b").s_bytes.contains(cat.getBytes("UTF-8").length.toLong) &&
          byCol("b").s_checksum.contains(checksum(cat)), s"b$g b")
        assert(byCol("b").null_count == ks.count(i => bVal(i).isEmpty))
        assert(byCol("c").vtype == "f" &&
          byCol("c").r_sum.contains(ks.map(_ / 16.0).sum), s"b$g c")
        assert(byCol("d").vtype == "i" && byCol("d").ctype == "INT32" &&
          byCol("d").i_sum.contains(ks.flatMap(dVal).map(_.toLong).sum), s"b$g d (negatives)")
        assert(byCol("d").null_count == ks.count(i => dVal(i).isEmpty))
      }
    } finally alloc.close()
  }

  test("foreign differential: arrow-java COMPRESSED files decode bit-exact") {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo._
    import scala.jdk.CollectionConverters._
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      for (codecType <- Seq(
        org.apache.arrow.vector.compression.CompressionUtil.CodecType.LZ4_FRAME,
        org.apache.arrow.vector.compression.CompressionUtil.CodecType.ZSTD)) {
        val schema = new Schema(Seq(
          new Field("a", FieldType.notNullable(new ArrowType.Int(64, true)), null),
          new Field("b", FieldType.nullable(new ArrowType.Utf8()), null)).asJava)
        val root = VectorSchemaRoot.create(schema, alloc)
        val bos = new java.io.ByteArrayOutputStream()
        val writer = new org.apache.arrow.vector.ipc.ArrowFileWriter(
          root, null, java.nio.channels.Channels.newChannel(bos),
          new java.util.HashMap[String, String](),
          org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
          org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE, codecType)
        writer.start()
        val ks = 0 until 40 // large enough that compression actually engages
        root.allocateNew()
        val aV = root.getVector("a").asInstanceOf[BigIntVector]
        val bV = root.getVector("b").asInstanceOf[VarCharVector]
        def bVal(i: Int): Option[String] =
          if (i % 7 == 3) None else Some(s"v$i-${"abcabc" * (1 + i % 5)}")
        ks.foreach { i =>
          aV.setSafe(i, i.toLong * 37 - 100)
          bVal(i) match {
            case Some(s) => bV.setSafe(i, s.getBytes("UTF-8"))
            case None => bV.setNull(i)
          }
        }
        root.setRowCount(ks.length)
        writer.writeBatch()
        writer.end(); writer.close(); root.close()

        val got = Arrow.parseArrow(3L, bos.toByteArray)
        val byCol = got.map(r => r.name -> r).toMap
        assert(byCol("a").vtype == "i" &&
          byCol("a").i_sum.contains(ks.map(i => i.toLong * 37 - 100).sum), s"$codecType a")
        val cat = ks.flatMap(bVal).mkString("")
        assert(byCol("b").vtype == "s" &&
          byCol("b").s_bytes.contains(cat.getBytes("UTF-8").length.toLong) &&
          byCol("b").s_checksum.contains(checksum(cat)), s"$codecType b")
        assert(byCol("b").null_count == ks.count(i => bVal(i).isEmpty), s"$codecType nulls")
      }
    } finally alloc.close()
  }

  test("stream format: round trip + arrow-java both directions + damage") {
    // the stream twin must decode IDENTICALLY to the file format
    for (id <- Seq(0L, 1L, 5L, 7L)) {
      val fileRows = Arrow.parseArrow(id, Arrow.renderArrow(id))
      val streamRows = Arrow.parseArrowStream(id, Arrow.renderArrowStream(id))
      assert(streamRows == fileRows, s"arrows $id stream == file")
    }
    // arrow-java's ArrowStreamReader consumes our streams (all codecs)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      for (id <- Seq(0L, 1L, 5L)) {
        val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
          new java.io.ByteArrayInputStream(Arrow.renderArrowStream(id)), alloc,
          org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
        try {
          val root = reader.getVectorSchemaRoot
          var k = 0
          while (reader.loadNextBatch()) {
            val idV = root.getVector("id").asInstanceOf[org.apache.arrow.vector.BigIntVector]
            for (i <- 0 until root.getRowCount) {
              assert(idV.get(i) == Arrow.idVal(id, k), s"arrows $id row $k")
              k += 1
            }
          }
          assert(k == Arrow.nRows(id), s"arrows $id rows")
        } finally reader.close()
      }
      // ...and we consume arrow-java's ArrowStreamWriter output
      import org.apache.arrow.vector._
      import org.apache.arrow.vector.types.pojo._
      import scala.jdk.CollectionConverters._
      val schema = new Schema(Seq(
        new Field("a", FieldType.notNullable(new ArrowType.Int(64, true)), null),
        new Field("b", FieldType.nullable(new ArrowType.Utf8()), null)).asJava)
      val root = VectorSchemaRoot.create(schema, alloc)
      val bos = new java.io.ByteArrayOutputStream()
      val writer = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
        root, null, java.nio.channels.Channels.newChannel(bos))
      writer.start()
      root.allocateNew()
      val aV = root.getVector("a").asInstanceOf[BigIntVector]
      val bV = root.getVector("b").asInstanceOf[VarCharVector]
      (0 until 9).foreach { i =>
        aV.setSafe(i, i * 11L)
        if (i % 3 == 1) bV.setNull(i) else bV.setSafe(i, s"w$i".getBytes("UTF-8"))
      }
      root.setRowCount(9)
      writer.writeBatch()
      writer.end(); writer.close(); root.close()
      val got = Arrow.parseArrowStream(2L, bos.toByteArray)
      val byCol = got.map(r => r.name -> r).toMap
      assert(byCol("a").i_sum.contains((0 until 9).map(_ * 11L).sum), "foreign stream a")
      val cat = (0 until 9).filter(_ % 3 != 1).map(i => s"w$i").mkString("")
      assert(byCol("b").s_checksum.contains(checksum(cat)), "foreign stream b")
    } finally alloc.close()
    // damage: truncation mid-message, missing EOS, trailing garbage
    val good = Arrow.renderArrowStream(3L)
    assert(Arrow.parseArrowStreamSafe(3L, good).nonEmpty)
    assert(Arrow.parseArrowStreamSafe(3L, good.take(good.length - 9)).isEmpty, "missing EOS")
    assert(Arrow.parseArrowStreamSafe(3L, good.take(30)).isEmpty, "truncated message")
    assert(Arrow.parseArrowStreamSafe(3L, good ++ Array[Byte](1)).isEmpty, "trailing garbage")
    assert(Arrow.parseArrowStreamSafe(3L, Array.emptyByteArray).isEmpty)
  }

  test("damage ladder: magic, footer length, truncation, garbage quarantine") {
    val id = 7L
    val good = Arrow.renderArrow(id)
    assert(Arrow.parseArrowSafe(id, good).nonEmpty)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Arrow.parseArrowSafe(id, mut(0, 'X'.toByte)).isEmpty, "head magic")
    assert(Arrow.parseArrowSafe(id, mut(good.length - 1, 'X'.toByte)).isEmpty, "tail magic")
    assert(Arrow.parseArrowSafe(id, mut(good.length - 10, 0x7f.toByte)).isEmpty, "footer length")
    assert(Arrow.parseArrowSafe(id, good.take(24)).isEmpty, "truncation")
    assert(Arrow.parseArrowSafe(id, Array.emptyByteArray).isEmpty)
    // zero the whole footer: the flatbuffer root walk must bound-check
    val fLen = (good(good.length - 10) & 0xff) | ((good(good.length - 9) & 0xff) << 8)
    val smashed = good.clone()
    for (i <- (good.length - 10 - fLen) until (good.length - 10)) smashed(i) = 0x00.toByte
    assert(Arrow.parseArrowSafe(id, smashed).isEmpty, "smashed footer")
  }

  test("i64 sum-wrap bounds: huge block/buffer extents quarantine, not misread") {
    // two huge positive i64 extents can wrap their SUM past Long.MAX to a
    // negative that passes a combined `a + b > limit` check; each term must
    // be bounded individually first (the ORC stripe rule). Poison a real
    // file's footer block entry and a record-batch buffer entry with
    // near-MAX lengths and require whole-file quarantine, not garbage rows.
    val id = 6L // 6 % 3 == 0: an UNCOMPRESSED file, so buffer extents are raw
    val good = Arrow.renderArrow(id)
    assert(Arrow.parseArrowSafe(id, good).nonEmpty)
    def le64(v: Long): Array[Byte] = (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    def find(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
      var p = from
      while (p + needle.length <= hay.length) {
        if (needle.indices.forall(i => hay(p + i) == needle(i))) return p
        p += 1
      }
      -1
    }
    // record batch 0's file offset = the THIRD continuation marker (the
    // first is the schema message, the second the dictionary batch); its
    // footer entry starts with that offset as i64
    val marker = Array[Byte](-1, -1, -1, -1)
    val block0 = find(good, marker,
      find(good, marker, find(good, marker, 0) + 4) + 4)
    assert(block0 > 0, "record batch marker")
    val entryAt = find(good, le64(block0.toLong), block0)
    assert(entryAt > 0, "footer block entry")
    val pb = good.clone()
    le64(Long.MaxValue - 15).zipWithIndex.foreach { case (b, i) => pb(entryAt + 16 + i) = b }
    assert(Arrow.parseArrowSafe(id, pb).isEmpty, "block bodyLen wrap")
    // the id column's data buffer entry is (offset 8, length 8·rows) in the
    // batch metadata (buffer 0 is the 1-byte validity, padded to 8)
    val rows0 = math.min(Arrow.nRows(id), Arrow.RowsPerBatch)
    val bufAt = find(good, le64(8L) ++ le64(8L * rows0), block0)
    assert(bufAt > 0, "id data buffer entry")
    val pf = good.clone()
    le64(Long.MaxValue - 4).zipWithIndex.foreach { case (b, i) => pf(bufAt + 8 + i) = b }
    assert(Arrow.parseArrowSafe(id, pf).isEmpty, "buffer length wrap")
  }

  test("operator: damaged file quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Arrow.encodeArrow(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 3)) else (id, b)
    }.toDF("doc_id", "arrow")
    val got = Arrow.arrowBatches(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    for (id <- (0L until 24L) if id != 8L) {
      val nBatches = (Arrow.nRows(id) + 2) / 3
      assert(byDoc(id).length == 5 * nBatches, s"arrow $id")
    }
  }
}
