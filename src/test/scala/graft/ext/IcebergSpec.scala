package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class IcebergSpec extends AnyFunSuite {

  private def files(id: Long): Seq[(String, Array[Byte])] =
    Seq(("metadata/v1.metadata.json",
      Iceberg.renderMetadataJson(id).getBytes("UTF-8")),
      (s"metadata/snap-${Iceberg.snapshotIdOf(id)}.avro", Iceberg.renderManifestList(id))) ++
      (0 until Iceberg.nManifests(id)).map(m =>
        (s"metadata/manifest-$m.avro", Iceberg.renderManifest(id, m)))

  test("round-trip: the pointer chain recovers the closed-form active set") {
    for (id <- 0L until 96L) {
      val got = Iceberg.walkTable(id, files(id))
      val expected = (0 until Iceberg.nManifests(id)).flatMap { m =>
        (0 until Iceberg.nEntries(id, m))
          .filter(j => Iceberg.statusOf(id, m, j) != 2)
          .map(j => Iceberg.IcebergFile(id, Iceberg.dataPathOf(m, j),
            Iceberg.recordsOf(id, m, j), Iceberg.bytesOf(id, m, j)))
      }
      assert(got == expected, s"ice $id active set")
      // deletions actually pruned something somewhere in the sweep
      val all = (0 until Iceberg.nManifests(id)).map(m => Iceberg.nEntries(id, m)).sum
      if (got.length == all) () else assert(got.length < all)
    }
    assert((0L until 96L).exists { id =>
      (0 until Iceberg.nManifests(id)).exists(m =>
        (0 until Iceberg.nEntries(id, m)).exists(j => Iceberg.statusOf(id, m, j) == 2))
    }, "DELETED entries occur")
    assert((0L until 96L).exists(Iceberg.nManifests(_) == 2), "multi-manifest tables occur")
  }

  test("the foreign Avro library reads the manifest containers") {
    // the manifests are REAL Avro object containers: avro-java must read
    // them with its own generic machinery
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val id = 11L
    for (m <- 0 until Iceberg.nManifests(id)) {
      val reader = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(Iceberg.renderManifest(id, m)),
        new GenericDatumReader[GenericRecord]())
      var j = 0
      while (reader.hasNext) {
        val rec = reader.next()
        assert(rec.get("status").asInstanceOf[Int] == Iceberg.statusOf(id, m, j), s"m$m e$j status")
        val df = rec.get("data_file").asInstanceOf[GenericRecord]
        assert(df.get("file_path").toString == Iceberg.dataPathOf(m, j), s"m$m e$j path")
        assert(df.get("record_count").asInstanceOf[Long] == Iceberg.recordsOf(id, m, j))
        j += 1
      }
      reader.close()
      assert(j == Iceberg.nEntries(id, m), s"m$m entry count")
    }
  }

  test("damage ladder: stale snapshot, missing files, bad status, JSON garbage") {
    val id = 4L
    val good = files(id)
    assert(Iceberg.walkTableSafe(id, good).nonEmpty)
    // current-snapshot-id pointing at a snapshot that is not in the array
    val badCur = good.map {
      case (p, b) if p.endsWith(".metadata.json") =>
        (p, new String(b, "UTF-8").replace(
          s""""current-snapshot-id":${Iceberg.snapshotIdOf(id)}""",
          """"current-snapshot-id":999""").getBytes("UTF-8"))
      case f => f
    }
    assert(Iceberg.walkTableSafe(id, badCur).isEmpty, "unresolvable current snapshot")
    // the STALE snapshot's manifest list is absent: a reader that takes
    // the newest-by-order instead of resolving current would... resolve
    // here to the same; instead drop the CURRENT manifest list file
    assert(Iceberg.walkTableSafe(id,
      good.filterNot(_._1.startsWith("metadata/snap-"))).isEmpty, "missing manifest list")
    // a referenced manifest missing from the listing
    assert(Iceberg.walkTableSafe(id,
      good.filterNot(_._1 == "metadata/manifest-0.avro")).isEmpty, "missing manifest")
    // no metadata.json at all
    assert(Iceberg.walkTableSafe(id,
      good.filterNot(_._1.endsWith(".metadata.json"))).isEmpty, "missing metadata.json")
    // JSON garbage
    val badJson = good.map {
      case (p, _) if p.endsWith(".metadata.json") => (p, "{not json".getBytes("UTF-8"))
      case f => f
    }
    assert(Iceberg.walkTableSafe(id, badJson).isEmpty, "metadata garbage")
    // format-version past the surface
    val v9 = good.map {
      case (p, b) if p.endsWith(".metadata.json") =>
        (p, new String(b, "UTF-8").replace(""""format-version":2""", """"format-version":9""").getBytes("UTF-8"))
      case f => f
    }
    assert(Iceberg.walkTableSafe(id, v9).isEmpty, "format-version ceiling")
    // duplicate path in the listing
    assert(Iceberg.walkTableSafe(id, good ++ good.take(1)).isEmpty, "duplicate path")
  }

  test("multiple metadata versions: the HIGHEST vN wins, not an arbitrary one") {
    val id = 8L
    val good = files(id)
    // plant an OLDER v0.metadata.json pointing at snapshot 999 (absent):
    // a reader that picks arbitrarily sometimes follows it and dies
    val stale = Iceberg.renderMetadataJson(id)
      .replace(s""""current-snapshot-id":${Iceberg.snapshotIdOf(id)}""",
        """"current-snapshot-id":999""")
    val withOld = ("metadata/v0.metadata.json", stale.getBytes("UTF-8")) +: good
    assert(Iceberg.walkTable(id, withOld).nonEmpty, "v1 beats v0")
    // v10 beats v9 numerically (lexicographic order would pick v9)
    val v9 = ("metadata/v9.metadata.json", stale.getBytes("UTF-8"))
    val v10 = ("metadata/v10.metadata.json",
      Iceberg.renderMetadataJson(id).getBytes("UTF-8"))
    val multi = Seq(v9, v10) ++ good.filterNot(_._1.endsWith(".metadata.json"))
    assert(Iceberg.walkTable(id, multi).nonEmpty, "v10 beats v9")
    val multiRev = Seq(v10, v9) ++ good.filterNot(_._1.endsWith(".metadata.json"))
    assert(Iceberg.walkTable(id, multiRev).nonEmpty, "order-independent")
  }

  test("operator: damaged table quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Iceberg.encodeIceberg(docs).as[(Long, String, Array[Byte])].map {
      case (id, p, b) =>
        if (id == 6L && p.endsWith(".metadata.json")) (id, p, b.take(10)) else (id, p, b)
    }.toDF("doc_id", "path", "content")
    val got = Iceberg.icebergState(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(6L))
    for (id <- (0L until 24L) if id != 6L) {
      val expected = (0 until Iceberg.nManifests(id)).map(m =>
        (0 until Iceberg.nEntries(id, m)).count(j => Iceberg.statusOf(id, m, j) != 2)).sum
      assert(byDoc(id).length == expected, s"ice $id")
    }
  }

  // ---------------- v2 position deletes ----------------

  private def filesV2(id: Long): Seq[(String, Array[Byte])] = {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    Iceberg.encodeIcebergV2(Seq(Tuple1(id)).toDF("doc_id"))
      .as[(Long, String, Array[Byte])].collect().toSeq.map(r => (r._2, r._3))
  }

  private def expectedV2(id: Long): Seq[Iceberg.IcebergV2File] =
    for {
      m <- 0 until Iceberg.nManifests2(id)
      j <- 0 until Iceberg.nEntries2(id, m)
      if Iceberg.statusOf2(id, m, j) != 2
    } yield {
      val rc = Iceberg.recordsOf2(id, m, j)
      val dels = Iceberg.nDeletes2(id, m, j).toLong
      Iceberg.IcebergV2File(id, Iceberg.dataPathOf2(m, j), rc, rc - dels, dels)
    }

  test("v2 round-trip: merge-on-read accounting matches the closed form") {
    var sawDeletes = false
    var sawDangling = false
    for (id <- 0L until 48L) {
      val got = Iceberg.walkTableV2(id, filesV2(id))
      assert(got == expectedV2(id), s"icev2 $id")
      if (got.exists(_.deleted_rows > 0)) sawDeletes = true
      // dangling = delete rows aimed at a DELETED-status data file
      if ((0 until Iceberg.nManifests2(id)).exists(m =>
        (0 until Iceberg.nEntries2(id, m)).exists(j =>
          Iceberg.statusOf2(id, m, j) == 2 && Iceberg.nDeletes2(id, m, j) > 0)))
        sawDangling = true
    }
    assert(sawDeletes, "fixture must exercise live deletes")
    assert(sawDangling, "fixture must exercise dangling deletes")
  }

  test("v2: duplicate positions count once") {
    val id = 1L
    val doubledRows = Iceberg.deleteRows2(id) ++ Iceberg.deleteRows2(id)
    val doubled = filesV2(id).map { case (p, b) =>
      if (p == "data/deletes-0.avro")
        (p, Iceberg.renderDeleteFile2(id, Some(doubledRows)))
      else if (p == "metadata/manifest2-del.avro")
        (p, Iceberg.renderDeleteManifest2(id, Some(doubledRows.length.toLong)))
      else (p, b)
    }
    val got = Iceberg.walkTableV2(id, doubled)
    assert(got == expectedV2(id), "duplicate positions must not double-count")
  }

  test("v2 damage ladder: count drift, out-of-range pos, missing delete file") {
    val id = 2L
    val good = filesV2(id)
    assert(Iceberg.walkTableV2Safe(id, good).nonEmpty)
    // manifest-declared row count disagreeing with the delete file
    val drift = good.map { case (p, b) =>
      if (p == "metadata/manifest2-del.avro")
        (p, Iceberg.renderDeleteManifest2(id, Some(999L))) else (p, b)
    }
    assert(Iceberg.walkTableV2Safe(id, drift).isEmpty, "count drift")
    // a position at/past the target's record count (an active file's path)
    val target = expectedV2(id).head
    val oobRows = Iceberg.deleteRows2(id) :+ ((target.file_path, target.record_count))
    val oob = good.map { case (p, b) =>
      if (p == "data/deletes-0.avro") (p, Iceberg.renderDeleteFile2(id, Some(oobRows)))
      else if (p == "metadata/manifest2-del.avro")
        (p, Iceberg.renderDeleteManifest2(id, Some(oobRows.length.toLong)))
      else (p, b)
    }
    assert(Iceberg.walkTableV2Safe(id, oob).isEmpty, "out-of-range pos")
    // missing delete file
    assert(Iceberg.walkTableV2Safe(id, good.filter(_._1 != "data/deletes-0.avro")).isEmpty)
  }

  // ---------------- equality deletes + sequence numbers ----------------

  private def filesEq(id: Long): Seq[(String, Array[Byte])] = {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    Iceberg.encodeIcebergEq(Seq(Tuple1(id)).toDF("doc_id"))
      .as[(Long, String, Array[Byte])].collect().toSeq.map(r => (r._2, r._3))
  }

  private def expectedEq(id: Long): Seq[Iceberg.IcebergEqFile] =
    for {
      m <- 0 until Iceberg.nManifestsE(id)
      j <- 0 until Iceberg.nEntriesE(id, m)
      if Iceberg.statusOfE(id, m, j) != 2
    } yield {
      val rc = Iceberg.recordsOfE(id, m, j)
      val seq = Iceberg.seqOfE(id, m, j)
      val lang = Iceberg.langOfE(id, m, j)
      val pos = if (seq <= Iceberg.DeleteSeqE) Iceberg.nPosDeletesE(id, m, j).toLong else 0L
      val eqDead = lang == Iceberg.eqLangE(id) && seq < Iceberg.DeleteSeqE
      Iceberg.IcebergEqFile(id, Iceberg.dataPathOfE(m, j), lang, seq, rc, pos, eqDead,
        if (eqDead) 0L else rc - pos)
    }

  test("eq round-trip: sequence-number rules decide who dies") {
    var sawEqDead = false
    var sawEqEscape = false // lang matches but seq >= delete seq
    var sawPosEscape = false // seq above the position delete's
    for (id <- 0L until 64L) {
      val got = Iceberg.walkTableEq(id, filesEq(id))
      assert(got == expectedEq(id), s"iceeq $id")
      got.foreach { f =>
        if (f.eq_deleted) sawEqDead = true
        if (!f.eq_deleted && f.lang == Iceberg.eqLangE(id) && f.seq >= Iceberg.DeleteSeqE)
          sawEqEscape = true
        if (f.seq > Iceberg.DeleteSeqE && Iceberg.nPosDeletesE(id,
          f.file_path.split("-")(1).toInt, f.file_path.split("-")(2).stripSuffix(".parquet").toInt) > 0)
          sawPosEscape = true
      }
    }
    assert(sawEqDead, "fixture must kill a file by equality")
    assert(sawEqEscape, "fixture must have a matching-lang file ABOVE the delete seq")
    assert(sawPosEscape, "fixture must have position deletes escaped by seq")
  }

  test("eq damage ladder: ids on the wrong entry kind, count drift") {
    val id = 2L
    val good = filesEq(id)
    assert(Iceberg.walkTableEqSafe(id, good).nonEmpty)
    // missing eq delete file
    assert(Iceberg.walkTableEqSafe(id, good.filter(_._1 != "data/eq-eqdel.avro")).isEmpty)
    // missing pos delete file
    assert(Iceberg.walkTableEqSafe(id, good.filter(_._1 != "data/eq-posdel.avro")).isEmpty)
    // torn delete manifest
    val torn = good.map { case (p, b) =>
      if (p == "metadata/manifesteq-del.avro") (p, b.take(b.length - 4)) else (p, b)
    }
    assert(Iceberg.walkTableEqSafe(id, torn).isEmpty)
  }

  test("eq operator: damaged table quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 12L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Iceberg.encodeIcebergEq(docs).as[(Long, String, Array[Byte])].map {
      case (id, p, b) =>
        if (id == 3L && p == "data/eq-eqdel.avro") (id, p, b.take(10)) else (id, p, b)
    }.toDF("doc_id", "path", "content")
    val got = Iceberg.icebergEqState(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(3L))
    for (id <- (0L until 12L) if id != 3L)
      assert(byDoc(id).toSeq.sortBy(_.file_path) == expectedEq(id).sortBy(_.file_path), s"iceeq $id")
  }

  test("v2 operator: damaged table quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 16L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Iceberg.encodeIcebergV2(docs).as[(Long, String, Array[Byte])].map {
      case (id, p, b) =>
        if (id == 4L && p == "data/deletes-0.avro") (id, p, b.take(12)) else (id, p, b)
    }.toDF("doc_id", "path", "content")
    val got = Iceberg.icebergV2State(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(4L))
    for (id <- (0L until 16L) if id != 4L)
      assert(byDoc(id).toSeq.sortBy(_.file_path) == expectedV2(id).sortBy(_.file_path), s"icev2 $id")
  }
}
