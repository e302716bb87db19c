package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class ParquetFileSpec extends AnyFunSuite {

  test("round-trip: footer walk + full page decode recover the closed-form aggregates") {
    def strStats(ss: Seq[String]): (Long, Long) = {
      val b = ss.mkString("").getBytes("UTF-8")
      var ck = 0L
      b.foreach(x => ck = (ck * 31 + (x & 0xff)) % 1000000007L)
      (b.length.toLong, ck)
    }
    for (id <- 0L until 96L) {
      val rows = ParquetFile.parseParquet(id, ParquetFile.renderParquet(id))
      val n = ParquetFile.nRows(id)
      val nGroups = (n + 2) / 3
      assert(rows.length == 4 * nGroups, s"pq $id chunk count")
      val codec = if (ParquetFile.useSnappy(id)) "SNAPPY" else "UNCOMPRESSED"
      for (g <- 0 until nGroups) {
        val ks = (3 * g) until math.min(3 * g + 3, n)
        val byCol = rows.filter(_.row_group == g).map(r => r.col_idx -> r).toMap
        val c0 = byCol(0L)
        assert(c0.path == "id" && c0.ptype == "INT64" && c0.codec == codec)
        assert(c0.num_values == ks.length && c0.i_sum.contains(
          ks.map(k => ParquetFile.idVal(id, k)).sum), s"pq $id g$g ids")
        val c1 = byCol(1L)
        assert(c1.path == "title" && c1.ptype == "BYTE_ARRAY" && c1.codec == codec)
        val (nb, ck) = strStats(ks.map(k => ParquetFile.titleVal(id, k)))
        assert(c1.s_bytes.contains(nb) && c1.s_checksum.contains(ck), s"pq $id g$g titles")
        val c2 = byCol(2L)
        assert(c2.path == "score" && c2.ptype == "DOUBLE")
        assert(c2.r_sum.contains(ks.map(k => ParquetFile.scoreVal(id, k)).sum),
          s"pq $id g$g scores")
        // the OPTIONAL column: num_values counts nulls, aggregates don't
        val c3 = byCol(3L)
        assert(c3.path == "note" && c3.num_values == ks.length && c3.vtype == "s")
        val (nb3, ck3) = strStats(
          ks.filter(k => !ParquetFile.noteIsNull(id, k)).map(k => ParquetFile.noteVal(id, k)))
        assert(c3.s_bytes.contains(nb3) && c3.s_checksum.contains(ck3), s"pq $id g$g notes")
      }
    }
    // every decode arm occurs across the corpus
    assert((0L until 96L).exists(ParquetFile.nRows(_) > 3), "two-group files occur")
    assert((0L until 96L).exists(ParquetFile.useSnappy), "snappy files occur")
    assert((0L until 96L).exists(id => ParquetFile.titleDict(id) && ParquetFile.useSnappy(id)),
      "snappy + dictionary chunks occur")
    assert((0L until 96L).exists { id =>
      (0 until ParquetFile.nRows(id)).grouped(3).exists(ks =>
        ks.forall(k => !ParquetFile.noteIsNull(id, k)))
    }, "all-present optional PAGES occur (def levels must still be written)")
    assert((0L until 96L).exists(id => ParquetFile.useV2(id) && ParquetFile.useSnappy(id)),
      "snappy v2 pages occur (is_compressed + levels outside the region)")
    assert((0L until 96L).exists(id => ParquetFile.useV2(id) && ParquetFile.titleDict(id)),
      "dictionary-encoded v2 pages occur")
  }

  test("SPARK reads the from-scratch files: exact rows, exact types") {
    val spark = graft.SparkSpec.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_pqf").toFile
    try {
      val ids = Seq(0L, 1L, 5L, 17L)
      ids.foreach { id =>
        java.nio.file.Files.write(
          new java.io.File(dir, s"part-$id.parquet").toPath, ParquetFile.renderParquet(id))
      }
      val df = spark.read.parquet(dir.getAbsolutePath)
      val sch = df.schema
      assert(sch("id").dataType == org.apache.spark.sql.types.LongType)
      assert(sch("title").dataType == org.apache.spark.sql.types.StringType,
        "UTF8 converted type must surface as StringType")
      assert(sch("score").dataType == org.apache.spark.sql.types.DoubleType)
      assert(sch("note").dataType == org.apache.spark.sql.types.StringType)
      val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getString(3)))).toSet
      val expected = ids.flatMap { id =>
        (0 until ParquetFile.nRows(id)).map(k =>
          (ParquetFile.idVal(id, k), ParquetFile.titleVal(id, k), ParquetFile.scoreVal(id, k),
            if (ParquetFile.noteIsNull(id, k)) None else Some(ParquetFile.noteVal(id, k))))
      }.toSet
      assert(got == expected,
        "Spark must decode exactly the fixture rows — snappy, dictionary and nulls included")
      // row-group pruning probe: Spark prunes groups by OUR footer
      // statistics, so a wrong min/max would silently drop this row
      ids.foreach { id =>
        val k = ParquetFile.nRows(id) - 1 // a row in the LAST row group
        val hit = df.filter(org.apache.spark.sql.functions.col("id") === ParquetFile.idVal(id, k))
          .collect()
        assert(hit.length == 1 && hit.head.getString(1) == ParquetFile.titleVal(id, k),
          s"pq $id stats-pruned read")
      }
    } finally {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("foreign differential: the footer reader agrees with parquet-mr on REAL pyarrow files") {
    val conf = new org.apache.hadoop.conf.Configuration()
    for (table <- Seq("region", "nation", "documents", "embeddings", "lineitem")) {
      val path = s"/root/testdata/sf0.001/$table.parquet"
      val ours = ParquetFile.parseFooter(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val fm = reader.getFooter
        val blocks = fm.getBlocks.asScala.toSeq
        assert(ours.rowGroups.length == blocks.length, s"$table row group count")
        assert(ours.numRows == blocks.map(_.getRowCount).sum, s"$table num rows")
        assert(ours.createdBy == fm.getFileMetaData.getCreatedBy, s"$table created_by")
        ours.rowGroups.zip(blocks).zipWithIndex.foreach { case ((og, tb), g) =>
          assert(og.numRows == tb.getRowCount, s"$table g$g rows")
          val theirs = tb.getColumns.asScala.toSeq
          assert(og.columns.length == theirs.length, s"$table g$g column count")
          og.columns.zip(theirs).foreach { case (oc, tc) =>
            val ctx = s"$table g$g ${oc.path}"
            assert(oc.path == tc.getPath.toDotString, ctx)
            // parquet-mr's PrimitiveTypeName spells thrift BYTE_ARRAY "BINARY"
            val typeNames = Seq("BOOLEAN", "INT32", "INT64", "INT96", "FLOAT",
              "DOUBLE", "BINARY", "FIXED_LEN_BYTE_ARRAY")
            assert(typeNames(oc.typ) == tc.getPrimitiveType.getPrimitiveTypeName.name(),
              s"$ctx type")
            val codecNames = Seq("UNCOMPRESSED", "SNAPPY", "GZIP", "LZO", "BROTLI",
              "LZ4", "ZSTD", "LZ4_RAW")
            assert(codecNames(oc.codec) == tc.getCodec.name(), s"$ctx codec")
            assert(oc.numValues == tc.getValueCount, s"$ctx value count")
            assert(oc.dataPageOffset == tc.getFirstDataPageOffset, s"$ctx data page offset")
            assert(oc.totalCompressed == tc.getTotalSize, s"$ctx compressed size")
            assert(oc.totalUncompressed == tc.getTotalUncompressedSize, s"$ctx uncompressed size")
            // STATISTICS agree byte-for-byte (both sides read the same
            // footer; a drifted bound means a mis-parsed Statistics struct)
            val ts = tc.getStatistics
            if (ts != null && !ts.isEmpty) {
              if (ts.isNumNullsSet)
                assert(oc.statNullCount == ts.getNumNulls, s"$ctx stat null count")
              if (ts.hasNonNullValue) {
                assert(oc.statMin.map(_.toSeq).contains(ts.getMinBytes.toSeq), s"$ctx stat min")
                assert(oc.statMax.map(_.toSeq).contains(ts.getMaxBytes.toSeq), s"$ctx stat max")
              }
            }
            val theirEncs = tc.getEncodings.asScala.map(_.name()).toSet
            val ourEncs = oc.encodings.map {
              case 0 => "PLAIN"; case 2 => "PLAIN_DICTIONARY"; case 3 => "RLE"
              case 4 => "BIT_PACKED"; case 5 => "DELTA_BINARY_PACKED"
              case 6 => "DELTA_LENGTH_BYTE_ARRAY"; case 7 => "DELTA_BYTE_ARRAY"
              case 8 => "RLE_DICTIONARY"; case 9 => "BYTE_STREAM_SPLIT"
              case other => s"?$other"
            }.toSet
            assert(ourEncs == theirEncs, s"$ctx encodings $ourEncs vs $theirEncs")
          }
        }
      } finally reader.close()
    }
  }

  test("foreign VALUES differential: real pyarrow chunks decode to Spark's own numbers") {
    // the strongest reader check: snappy + RLE_DICTIONARY (with PLAIN
    // fallback) + optional-column def levels, written by parquet-cpp,
    // decoded by the from-scratch page walk — and every aggregate must
    // equal what Spark's own parquet reader computes over the same file.
    // Both sides fold values in file order within the single row group,
    // so double sums compare exactly, not within an epsilon.
    import org.apache.spark.sql.types._
    val spark = graft.SparkSpec.spark
    for (table <- Seq("region", "nation", "documents", "lineitem", "embeddings")) {
      val path = s"/root/testdata/sf0.001/$table.parquet"
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      val rows = ParquetFile.parseParquet(0L, bytes)
      assert(rows.nonEmpty, s"$table must surface")
      val byPath = rows.map(r => r.path -> r).toMap
      val df = spark.read.parquet(path)
      df.schema.fields.foreach { f =>
        byPath.get(f.name).foreach { r =>
          val ctx = s"$table.${f.name}"
          f.dataType match {
            case LongType =>
              assert(r.vtype == "i", s"$ctx must decode")
              val want = df.selectExpr(s"sum(${f.name})").head.getLong(0)
              assert(r.i_sum.contains(want), s"$ctx i_sum ${r.i_sum} vs $want")
            case IntegerType =>
              assert(r.vtype == "i", s"$ctx must decode")
              val want = df.selectExpr(s"sum(CAST(${f.name} AS BIGINT))").head.getLong(0)
              assert(r.i_sum.contains(want), s"$ctx i_sum ${r.i_sum} vs $want")
            case TimestampType | TimestampNTZType =>
              assert(r.vtype == "i", s"$ctx must decode")
              val want = df.selectExpr(
                s"sum(unix_micros(CAST(${f.name} AS TIMESTAMP)))").head.getLong(0)
              assert(r.i_sum.contains(want), s"$ctx ts i_sum ${r.i_sum} vs $want")
            case DoubleType =>
              assert(r.vtype == "f", s"$ctx must decode")
              val want = df.selectExpr(s"sum(${f.name})").head.getDouble(0)
              assert(r.r_sum.contains(want), s"$ctx r_sum ${r.r_sum} vs $want")
            case StringType =>
              assert(r.vtype == "s", s"$ctx must decode")
              val vals = df.select(f.name).collect().map(_.getString(0))
              val b = vals.mkString("").getBytes("UTF-8")
              var ck = 0L
              b.foreach(x => ck = (ck * 31 + (x & 0xff)) % 1000000007L)
              assert(r.s_bytes.contains(b.length.toLong), s"$ctx s_bytes")
              assert(r.s_checksum.contains(ck), s"$ctx s_checksum (file-order fold)")
            case _ => ()
          }
        }
      }
    }
    // the nested (repeated) float leaf DECODES through the generalized
    // level path — its per-file value sum must match Spark's own read
    val emb = ParquetFile.parseParquet(0L, java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/testdata/sf0.001/embeddings.parquet")))
    val leaves = emb.filter(_.path == "embedding.list.element")
    assert(leaves.nonEmpty && leaves.forall(_.vtype == "f"),
      "repeated leaf must decode through the level-generalized path")
    val want = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("sum(aggregate(embedding, cast(0.0 as double), (a, x) -> a + x))")
      .head.getDouble(0)
    val got = leaves.flatMap(_.r_sum).sum
    assert(math.abs(got - want) <= math.abs(want) * 1e-9 + 1e-6,
      s"embedding value sum $got vs spark $want")
  }

  test("foreign differential: Spark-written V2 pages (delta encodings) decode bit-exact") {
    // parquet.writer.version=v2 makes parquet-mr emit DataPageHeaderV2
    // with the DELTA family when the dictionary is off (ints as
    // DELTA_BINARY_PACKED incl. INT32 wrapping, strings as
    // DELTA_BYTE_ARRAY front coding) and RLE_DICTIONARY v2 pages when on
    // — all snappy-compressed with levels outside the compressed region
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pqv2").toFile
    try {
      for (dict <- Seq(true, false)) {
        val sub = new java.io.File(dir, s"dict_$dict")
        val n = 500
        def aVal(i: Int): Long = i.toLong * 37 - 7777
        def bVal(i: Int): String = s"prefix-common-$i-${"pad" * (i % 4)}"
        def cVal(i: Int): Double = i / 8.0
        val df = (0 until n).map(i => (aVal(i), bVal(i), cVal(i), i)).toDF("a", "b", "c", "d")
        df.coalesce(1).write
          .option("parquet.writer.version", "v2")
          .option("parquet.enable.dictionary", dict.toString)
          .option("compression", "snappy")
          .parquet(sub.getAbsolutePath)
        val file = sub.listFiles().filter(_.getName.endsWith(".parquet")).head
        val bytes = java.nio.file.Files.readAllBytes(file.toPath)
        val rows = ParquetFile.parseParquet(1L, bytes)
        assert(rows.map(_.row_group).distinct == Seq(0L), s"dict=$dict one row group")
        val byPath = rows.map(r => r.path -> r).toMap
        assert(byPath("a").vtype == "i" &&
          byPath("a").i_sum.contains((0 until n).map(aVal).sum), s"dict=$dict a (int64)")
        val cat = (0 until n).map(bVal).mkString("")
        val cb = cat.getBytes("UTF-8")
        var ck = 0L
        cb.foreach(x => ck = (ck * 31 + (x & 0xff)) % 1000000007L)
        assert(byPath("b").vtype == "s" && byPath("b").s_bytes.contains(cb.length.toLong) &&
          byPath("b").s_checksum.contains(ck), s"dict=$dict b (strings, file order)")
        assert(byPath("c").vtype == "f" &&
          byPath("c").r_sum.contains((0 until n).map(cVal).sum), s"dict=$dict c (double)")
        assert(byPath("d").vtype == "i" &&
          byPath("d").i_sum.contains((0 until n).map(_.toLong).sum), s"dict=$dict d (int32)")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("damage ladder: magic, footer length, thrift garbage, page mismatch quarantine") {
    val id = 7L
    val good = ParquetFile.renderParquet(id)
    assert(ParquetFile.parseParquetSafe(id, good).nonEmpty)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(ParquetFile.parseParquetSafe(id, mut(0, 'X'.toByte)).isEmpty, "head magic")
    assert(ParquetFile.parseParquetSafe(id, mut(good.length - 1, 'X'.toByte)).isEmpty, "tail magic")
    // footer length pointing past the file
    assert(ParquetFile.parseParquetSafe(id, mut(good.length - 5, 0x7f.toByte)).isEmpty, "footer length")
    assert(ParquetFile.parseParquetSafe(id, good.take(20)).isEmpty, "truncation")
    assert(ParquetFile.parseParquetSafe(id, Array.emptyByteArray).isEmpty)
    // corrupt a byte mid-footer: thrift structure breaks -> quarantine,
    // never a wrong row (flip the created_by tail, which IS consumed)
    val fLen = (good(good.length - 8) & 0xff) | ((good(good.length - 7) & 0xff) << 8)
    val footerStart = good.length - 8 - fLen
    val damaged = good.clone()
    // zero the first footer byte (the version field header)
    damaged(footerStart) = 0x00.toByte
    val r = ParquetFile.parseParquetSafe(id, damaged)
    // an immediate stop byte means an empty FileMetaData: num_rows missing -> quarantine
    assert(r.isEmpty, "empty footer struct quarantines")
  }

  test("operator: damaged file quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = ParquetFile.encodeParquet(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 6)) else (id, b)
    }.toDF("doc_id", "pq")
    val got = ParquetFile.parquetMeta(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    for (id <- (0L until 24L) if id != 8L) {
      val nGroups = (ParquetFile.nRows(id) + 2) / 3
      assert(byDoc(id).length == 4 * nGroups, s"pq $id")
    }
  }

  test("page CRC: a flipped body byte inside an otherwise-valid page quarantines") {
    // the writer stamps PageHeader.crc (as parquet-mr does by default);
    // the reader verifies it over the stored body — damage the length
    // fields cannot see (a flipped bit inside a fixed-width PLAIN value)
    // now fails
    val id = 2L // UNCOMPRESSED: body bytes are the values themselves
    val good = ParquetFile.renderParquet(id)
    assert(ParquetFile.parseParquetSafe(id, good).nonEmpty)
    val f = ParquetFile.parseFooter(good)
    val c0 = f.rowGroups.head.columns.head // the INT64 id column
    // find the first data page body: header ends where the thrift stop
    // byte sits; flip a byte near the chunk's end (inside value bytes)
    val at = (c0.dataPageOffset + c0.totalCompressed - 3).toInt
    val bad = good.clone()
    bad(at) = (bad(at) ^ 1).toByte
    assert(ParquetFile.parseParquetSafe(id, bad).isEmpty,
      "CRC must catch a value-byte flip the structural checks cannot")
  }

  test("nested round-trip: Dremel reassembly recovers the closed-form records") {
    for (id <- 0L until 96L) {
      val rows = ParquetFile.parseNestedParquet(id, ParquetFile.renderNestedParquet(id))
      val n = ParquetFile.nRowsN(id)
      assert(rows.length == n, s"pqn $id row count")
      rows.zipWithIndex.foreach { case (r, k) =>
        assert(r.doc_id == id && r.row_idx == k.toLong)
        assert(r.id_val == ParquetFile.idVal(id, k))
        val wantName = if (ParquetFile.namePresent(id, k))
          Some(ParquetFile.nameValN(id, k)) else None
        assert(r.info_name == wantName, s"pqn $id row $k name")
        val wantW = if (ParquetFile.weightPresent(id, k))
          Some(ParquetFile.weightValN(id, k)) else None
        assert(r.info_weight == wantW, s"pqn $id row $k weight")
        val t = ParquetFile.nTagsN(id, k)
        assert(r.n_tags == t.toLong)
        assert(r.tags_cat ==
          (0 until t).map(j => ParquetFile.tagValN(id, k, j)).mkString(","))
        val p = ParquetFile.nPairsN(id, k)
        assert(r.n_pairs == p.toLong)
        assert(r.k_sum == (0 until p).map(j => ParquetFile.pairKValN(id, k, j)).sum)
        assert(r.v_cat == (0 until p).map { j =>
          if (ParquetFile.pairVPresent(id, k, j)) ParquetFile.pairVValN(id, k, j) else "_"
        }.mkString(","), s"pqn $id row $k v_cat")
      }
    }
  }

  test("SPARK reads the from-scratch NESTED files: exact rows, exact nesting") {
    // the strongest writer check for the nested arm — Spark's own
    // parquet reader (parquet-mr underneath) must assemble the same
    // structs/arrays from our rep/def level sections
    val spark = graft.SparkSpec.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_pqn").toFile
    try {
      for (id <- Seq(0L, 1L, 3L, 5L, 7L, 10L)) { // both codecs, both page versions
        val f = new java.io.File(dir, s"n_$id.parquet")
        java.nio.file.Files.write(f.toPath, ParquetFile.renderNestedParquet(id))
        val df = spark.read.parquet(f.getAbsolutePath)
        val got = df.selectExpr("id", "info.name", "info.weight",
            "tags", "pairs.k as pk", "pairs.v as pv")
          .collect().sortBy(_.getLong(0))
        assert(got.length == ParquetFile.nRowsN(id), s"pqn $id spark rows")
        got.zipWithIndex.foreach { case (row, k) =>
          assert(row.getLong(0) == ParquetFile.idVal(id, k))
          val wantName = if (ParquetFile.namePresent(id, k)) ParquetFile.nameValN(id, k) else null
          assert(row.getString(1) == wantName, s"pqn $id row $k spark name")
          if (ParquetFile.weightPresent(id, k))
            assert(row.getLong(2) == ParquetFile.weightValN(id, k))
          else assert(row.isNullAt(2), s"pqn $id row $k spark weight null")
          val tags = row.getSeq[String](3)
          assert(tags == (0 until ParquetFile.nTagsN(id, k)).map(j => ParquetFile.tagValN(id, k, j)),
            s"pqn $id row $k spark tags")
          val p = ParquetFile.nPairsN(id, k)
          assert(row.getSeq[Long](4) == (0 until p).map(j => ParquetFile.pairKValN(id, k, j)))
          val pv = row.getSeq[String](5)
          assert(pv == (0 until p).map(j =>
            if (ParquetFile.pairVPresent(id, k, j)) ParquetFile.pairVValN(id, k, j) else null),
            s"pqn $id row $k spark pairs.v")
        }
      }
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("bloom round-trip: every planted value hits; absent probes do not") {
    for (id <- 0L until 96L) {
      val bytes = ParquetFile.renderBloomParquet(id)
      val rows = ParquetFile.parseBloomParquet(id, bytes)
      val n = ParquetFile.nRowsB(id)
      val nGroups = (n + 2) / 3
      assert(rows.length == 2 * nGroups, s"pqb $id chunk count")
      rows.foreach { r =>
        assert(r.bloom_bytes == ParquetFile.BloomBytesB.toLong)
        assert(r.planted_hits == r.n_planted, s"pqb $id ${r.path} g${r.row_group}")
      }
      // absent probes: deterministic given the bytes; at 256 bytes per
      // ~3-row chunk the fixture never false-positives
      val f = ParquetFile.parseFooter(bytes)
      f.rowGroups.foreach { rg =>
        rg.columns.foreach { c =>
          val (nb, words) = ParquetFile.readBloom(bytes, c).get
          for (probe <- 0 until 16) {
            val h = if (c.path == "id") ParquetFile.bloomHashLong(-1000000L - probe)
              else ParquetFile.bloomHashBytes(s"absent-$id-$probe".getBytes("UTF-8"))
            assert(!ParquetFile.bloomContains(words, nb / 32, h),
              s"pqb $id ${c.path} absent probe $probe false-positived")
          }
        }
      }
    }
  }

  test("foreign differential: SPARK-written bloom filters accept their own values") {
    // parquet-mr writes SBBF/XXH64 blooms when asked; our reader walking
    // its header + bitset and hashing with the same convention must see
    // every actually-written value as present — a drifted hash, block
    // routing, or salt table gives ~all-misses
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pqbloom").toFile
    try {
      val n = 300
      val df = (0 until n).map(i => (i.toLong * 17, s"value-${i % 97}-x$i")).toDF("id", "title")
      df.coalesce(1).write
        .option("parquet.bloom.filter.enabled#id", "true")
        .option("parquet.bloom.filter.enabled#title", "true")
        .option("parquet.bloom.filter.expected.ndv#id", "300")
        .option("parquet.bloom.filter.expected.ndv#title", "300")
        .mode("overwrite").parquet(dir.getAbsolutePath)
      val file = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
      val bytes = java.nio.file.Files.readAllBytes(file.toPath)
      val f = ParquetFile.parseFooter(bytes)
      val withBloom = f.rowGroups.flatMap(_.columns).filter(_.bloomOffset >= 0)
      assert(withBloom.nonEmpty, "spark must have written blooms")
      withBloom.foreach { c =>
        val (nb, words) = ParquetFile.readBloom(bytes, c)
          .getOrElse(fail(s"${c.path}: bloom header not readable"))
        val blocks = nb / 32
        if (c.path == "id")
          (0 until n).foreach { i =>
            assert(ParquetFile.bloomContains(words, blocks, ParquetFile.bloomHashLong(i.toLong * 17)),
              s"spark bloom missed id ${i * 17}")
          }
        else
          (0 until n).foreach { i =>
            assert(ParquetFile.bloomContains(words, blocks,
              ParquetFile.bloomHashBytes(s"value-${i % 97}-x$i".getBytes("UTF-8"))),
              s"spark bloom missed title $i")
          }
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("bloom damage: a zeroed bitset loses every hit") {
    val id = 5L
    val good = ParquetFile.renderBloomParquet(id)
    assert(ParquetFile.parseBloomParquetSafe(id, good).nonEmpty)
    val f = ParquetFile.parseFooter(good)
    val c0 = f.rowGroups.head.columns.head
    // zero the first bloom's whole bitset (it sits at the END of the
    // header+bitset span): every planted probe must now miss
    val zeroed = good.clone()
    val bitsetStart = (c0.bloomOffset + c0.bloomLength).toInt - ParquetFile.BloomBytesB
    java.util.Arrays.fill(zeroed, bitsetStart, bitsetStart + ParquetFile.BloomBytesB, 0.toByte)
    val rows = ParquetFile.parseBloomParquet(id, zeroed)
    val hit = rows.find(r => r.row_group == 0L && r.col_idx == 0L).get
    assert(hit.planted_hits == 0L, "a zeroed bitset must lose every hit (the oracle's check)")
  }

  test("page-index round-trip: per-page locations and bounds match the closed forms") {
    for (id <- 0L until 96L) {
      val rows = ParquetFile.parsePageIndexParquet(id, ParquetFile.renderPageIndexParquet(id))
      val n = ParquetFile.nRowsI(id)
      val nPages = (n + 1) / 2
      assert(rows.length == 2 * nPages, s"pqi $id row count")
      rows.filter(_.path == "id").foreach { r =>
        val ks = (2 * r.page.toInt) until math.min(2 * r.page.toInt + 2, n)
        val vs = ks.map(k => ParquetFile.idValI(id, k))
        assert(!r.null_page && r.null_count == 0L)
        assert(r.first_row == 2L * r.page)
        assert(r.i_min.contains(vs.min) && r.i_max.contains(vs.max), s"pqi $id page ${r.page}")
      }
      rows.filter(_.path == "title").foreach { r =>
        val p = r.page.toInt
        val ks = (2 * p) until math.min(2 * p + 2, n)
        if (ParquetFile.titleNullPageI(id, p)) {
          assert(r.null_page && r.null_count == ks.length.toLong && r.s_min.isEmpty)
        } else {
          val vs = ks.map(k => ParquetFile.titleValI(id, k))
          assert(!r.null_page && r.null_count == 0L)
          assert(r.s_min.contains(vs.min) && r.s_max.contains(vs.max), s"pqi $id page $p")
        }
      }
    }
  }

  test("foreign differential: SPARK-written page indexes walk and cross-check") {
    // parquet-mr emits ColumnIndex/OffsetIndex by default; our reader
    // must parse both structs, survive its extra fields, and agree with
    // the data: chunk min over page mins == Spark's own column min
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pqidx").toFile
    try {
      val n = 5000 // enough rows for multiple pages per chunk
      val df = (0 until n).map(i => ((i * 2654435761L) % 1000003L, s"t-${(i * 37) % 991}%04d"))
        .toDF("id", "title")
      df.coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
      val file = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
      val bytes = java.nio.file.Files.readAllBytes(file.toPath)
      val f = ParquetFile.parseFooter(bytes)
      val indexed = f.rowGroups.flatMap(_.columns).filter(c =>
        c.offsetIndexOffset >= 0 && c.columnIndexOffset >= 0)
      assert(indexed.nonEmpty, "spark must have written page indexes")
      indexed.foreach { c =>
        val locs = ParquetFile.readOffsetIndex(bytes, c.offsetIndexOffset, c.offsetIndexLength)
        val ci = ParquetFile.readColumnIndex(bytes, c.columnIndexOffset, c.columnIndexLength)
        assert(ci.nullPages.length == locs.length, s"${c.path}: aligned page counts")
        assert(ci.nullCounts.forall(_.forall(_ == 0L)))
        if (c.path == "id") {
          val mins = ci.minValues.map { b =>
            var v = 0L; var i = 7
            while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
            v
          }
          val want = (0 until n).map(i => (i * 2654435761L) % 1000003L).min
          assert(mins.min == want, s"chunk min over page mins vs spark data")
        }
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("page-index damage: location drift and misaligned lists quarantine") {
    val id = 7L
    val good = ParquetFile.renderPageIndexParquet(id)
    assert(ParquetFile.parsePageIndexParquetSafe(id, good).nonEmpty)
    val f = ParquetFile.parseFooter(good)
    val c0 = f.rowGroups.head.columns.head
    // corrupt the first PageLocation's offset varint inside the OffsetIndex:
    // the page-header cross-check must quarantine
    val bad = good.clone()
    val oi = c0.offsetIndexOffset.toInt
    // field header for list + list header + first struct's field header = 3
    // bytes in, then the zigzag offset varint
    bad(oi + 3) = (bad(oi + 3) ^ 0x40).toByte
    assert(ParquetFile.parsePageIndexParquetSafe(id, bad).isEmpty, "offset drift")
    // truncate the ColumnIndex declared length: exact-consumption fails
    val torn = good.clone()
    assert(ParquetFile.parsePageIndexParquetSafe(id,
      torn.take(c0.columnIndexOffset.toInt + 2)).isEmpty, "torn index region")
  }

  test("nested operator: damaged file quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 16L).map(Tuple1(_)).toDF("doc_id")
    val mixed = ParquetFile.encodeNestedParquet(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 5L) (id, b.take(b.length - 6)) else (id, b)
    }.toDF("doc_id", "pq")
    val got = ParquetFile.parquetNested(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(5L))
    for (id <- (0L until 16L) if id != 5L)
      assert(byDoc(id).length == ParquetFile.nRowsN(id), s"pqn $id")
  }
}
