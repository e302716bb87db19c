package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class DeltaLogSpec extends AnyFunSuite {

  private def commits(id: Long): Seq[(Long, String)] =
    (0 until DeltaLog.nCommits(id)).map(c => (c.toLong, DeltaLog.renderCommit(id, c)))

  test("round-trip: replay recovers the closed-form active set") {
    for (id <- 0L until 96L) {
      val files = DeltaLog.replay(id, commits(id))
      val nc = DeltaLog.nCommits(id)
      val expected = (0 until nc).flatMap { c =>
        (0 until DeltaLog.addsAt(id, c))
          .filterNot(j => DeltaLog.removedAt(id, c, j))
          .map(j => DeltaLog.DeltaFile(id, DeltaLog.pathOf(c, j), c.toLong,
            DeltaLog.sizeOf(id, c, j), DeltaLog.langOf(id, c, j)))
      }
      assert(files.toSet == expected.toSet, s"dlog $id active set")
      // every non-final commit compacted at least one file away: the
      // active set is never the full add history
      val allAdds = (0 until nc).map(c => DeltaLog.addsAt(id, c)).sum
      if (nc > 1) assert(files.length < allAdds, s"dlog $id removes happened")
    }
  }

  test("replay order: input arrival order must not matter") {
    val id = 9L
    val fwd = DeltaLog.replay(id, commits(id))
    val rev = DeltaLog.replay(id, commits(id).reverse)
    assert(fwd == rev, "version sort drives replay, not arrival order")
  }

  test("re-add replaces; a tombstone for an unknown path is legal") {
    val base = Seq(
      0L -> ("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        """{"metaData":{"id":"t","format":{"provider":"parquet"},"partitionColumns":[]}}""" + "\n" +
        """{"add":{"path":"a.parquet","partitionValues":{},"size":10,"dataChange":true}}"""),
      1L -> ("""{"remove":{"path":"never-added.parquet","deletionTimestamp":1}}""" + "\n" +
        """{"add":{"path":"a.parquet","partitionValues":{"lang":"en"},"size":99,"dataChange":true}}"""))
    val files = DeltaLog.replay(5L, base)
    assert(files == Seq(DeltaLog.DeltaFile(5L, "a.parquet", 1L, 99L, "en")),
      "the re-add must replace the original, tombstone tolerated")
  }

  test("damage ladder: gaps, dup keys, unknown actions, protocol ceiling, missing metaData") {
    val id = 3L
    val good = commits(id)
    assert(DeltaLog.replaySafe(id, good).nonEmpty)
    // version gap
    assert(DeltaLog.replaySafe(id, good.map { case (v, s) => (if (v > 0) v + 1 else v, s) }).isEmpty,
      "version gap quarantines")
    // duplicate version
    assert(DeltaLog.replaySafe(id, good ++ good.take(1)).isEmpty, "duplicate version")
    // duplicate JSON key inside an action
    val dup = good.updated(0, (0L, good.head._2.replaceFirst(
      """\{"protocol":\{"minReaderVersion":1""",
      """{"protocol":{"minReaderVersion":1,"minReaderVersion":1""")))
    assert(DeltaLog.replaySafe(id, dup).isEmpty, "duplicate JSON key")
    // unknown action kind
    val unknown = good.updated(0, (0L, good.head._2 + """{"mystery":{}}""" + "\n"))
    assert(DeltaLog.replaySafe(id, unknown).isEmpty, "unknown action")
    // two actions on one line
    val two = good.updated(0, (0L, good.head._2.replaceFirst(
      """\{"protocol":""", """{"commitInfo":{},"protocol":""")))
    assert(DeltaLog.replaySafe(id, two).isEmpty, "one action per line")
    // reader version past our surface
    val v9 = good.updated(0, (0L, good.head._2.replace(
      """"minReaderVersion":1""", """"minReaderVersion":9""")))
    assert(DeltaLog.replaySafe(id, v9).isEmpty, "minReaderVersion ceiling")
    // missing metaData
    val noMeta = good.updated(0, (0L,
      good.head._2.linesIterator.filterNot(_.contains("metaData")).mkString("\n")))
    assert(DeltaLog.replaySafe(id, noMeta).isEmpty, "missing metaData")
    // JSON garbage
    assert(DeltaLog.replaySafe(id, good.updated(0, (0L, "not json"))).isEmpty)
    assert(DeltaLog.replaySafe(id, Seq.empty).isEmpty, "empty log")
  }

  test("operator: damaged table quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = DeltaLog.encodeDeltaLog(docs).as[(Long, Long, String)].map {
      case (id, v, s) => if (id == 7L && v == 0L) (id, v, s.take(40)) else (id, v, s)
    }.toDF("doc_id", "version", "content")
    val got = DeltaLog.deltaState(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(7L))
    for (id <- (0L until 24L) if id != 7L) {
      val nc = DeltaLog.nCommits(id)
      val expected = (0 until nc).map(c => (0 until DeltaLog.addsAt(id, c))
        .count(j => !DeltaLog.removedAt(id, c, j))).sum
      assert(byDoc(id).length == expected, s"dlog $id")
    }
  }

  // ---------------- checkpoint replay ----------------

  private def ckptFiles(id: Long): Seq[(String, Array[Byte])] = {
    val acts = DeltaLog.checkpointActions(id)
    Seq(
      ("_last_checkpoint",
        s"""{"version":${DeltaLog.CkptVersion},"size":${acts.length}}""".getBytes("UTF-8")),
      (f"${DeltaLog.CkptVersion}%020d.checkpoint.parquet",
        ParquetFile.renderDeltaCheckpoint(acts))) ++
      ((DeltaLog.CkptVersion + 1) until DeltaLog.nCommitsC(id)).map(c =>
        (f"$c%020d.json", DeltaLog.renderCommitC(id, c).getBytes("UTF-8")))
  }

  private def expectedActive(id: Long): Set[(String, Long, String)] = {
    val nc = DeltaLog.nCommitsC(id)
    (for {
      c <- 0 until nc
      j <- 0 until DeltaLog.addsAtC(id, c)
      if !DeltaLog.removedAtC(id, c, j)
    } yield (DeltaLog.pathOf(c, j), DeltaLog.sizeOfC(id, c, j), DeltaLog.langOfC(id, c, j))).toSet
  }

  test("checkpoint round-trip: seed from parquet + JSON tail equals the closed form") {
    for (id <- 0L until 48L) {
      val got = DeltaLog.replayCheckpoint(id, ckptFiles(id))
        .map(f => (f.path, f.size_bytes, f.lang)).toSet
      assert(got == expectedActive(id), s"dckp $id")
    }
  }

  test("checkpoint is load-bearing: the vacuumed JSON tail alone cannot reconstruct") {
    // a JSON-only replayer sees a log starting mid-stream (version gap
    // from 0) and must quarantine — the fixture's construction guarantee
    for (id <- 0L until 16L) {
      val tailOnly = ckptFiles(id).collect {
        case (name, bytes) if name.endsWith(".json") && name != "_last_checkpoint" =>
          (name.dropRight(5).toLong, new String(bytes, "UTF-8"))
      }
      assert(DeltaLog.replaySafe(id, tailOnly).isEmpty, s"dckp $id tail-only must fail")
    }
  }

  test("checkpoint damage ladder: pointer drift, torn parquet, tail gap quarantine") {
    val id = 3L
    val good = ckptFiles(id)
    assert(DeltaLog.replayCheckpointSafe(id, good).nonEmpty)
    // _last_checkpoint size disagreeing with the checkpoint's action count
    val badSize = good.map {
      case ("_last_checkpoint", _) =>
        ("_last_checkpoint", s"""{"version":${DeltaLog.CkptVersion},"size":1}""".getBytes("UTF-8"))
      case kv => kv
    }
    assert(DeltaLog.replayCheckpointSafe(id, badSize).isEmpty, "size drift")
    // missing pointer
    assert(DeltaLog.replayCheckpointSafe(id, good.filter(_._1 != "_last_checkpoint")).isEmpty)
    // torn checkpoint parquet
    val torn = good.map { case (n, b) =>
      if (n.endsWith(".checkpoint.parquet")) (n, b.take(b.length - 6)) else (n, b)
    }
    assert(DeltaLog.replayCheckpointSafe(id, torn).isEmpty, "torn checkpoint")
    // a gap in the JSON tail (drop the first tail commit, keep a later one)
    val nc = DeltaLog.nCommitsC(id)
    if (nc > DeltaLog.CkptVersion + 2) {
      val gap = good.filter(_._1 != f"${DeltaLog.CkptVersion + 1}%020d.json")
      assert(DeltaLog.replayCheckpointSafe(id, gap).isEmpty, "tail gap")
    }
    // expired tombstones in the checkpoint must not surface as active
    val acts = DeltaLog.checkpointActions(id)
    val removed = acts.collect { case ParquetFile.CkptRemove(p) => p }.toSet
    val got = DeltaLog.replayCheckpoint(id, good).map(_.path).toSet
    assert(removed.nonEmpty || id != 3L, "fixture should plant tombstones for id 3")
    assert(removed.intersect(got).isEmpty, "tombstoned paths surfaced as active")
  }

  test("checkpoint operator: damaged table quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 16L).map(Tuple1(_)).toDF("doc_id")
    val mixed = DeltaLog.encodeDeltaCheckpointLog(docs).as[(Long, String, Array[Byte])].map {
      case (id, n, b) =>
        if (id == 5L && n.endsWith(".checkpoint.parquet")) (id, n, b.take(30)) else (id, n, b)
    }.toDF("doc_id", "name", "content")
    val got = DeltaLog.deltaCheckpointState(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(5L))
    for (id <- (0L until 16L) if id != 5L)
      assert(byDoc(id).map(f => (f.path, f.size_bytes, f.lang)).toSet == expectedActive(id),
        s"dckp $id")
  }
}
