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
}
