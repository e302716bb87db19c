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
}
