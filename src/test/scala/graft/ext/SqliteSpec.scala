package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class SqliteSpec extends AnyFunSuite {

  test("round-trip: catalog walk, interior pages, every serial type, IPK alias") {
    var sawInterior = false
    var sawSingleLeaf = false
    for (id <- 0L until 96L) {
      val db = Sqlite.renderSqlite(id)
      // header sanity readable by any tool: magic + page size
      assert(new String(db, 0, 15, "ISO-8859-1") == "SQLite format 3" && db(15) == 0)
      val rows = Sqlite.parseSqlite(id, db)
      val byKey = rows.map(r => (r.tbl, r.rowid, r.col_idx) -> r).toMap
      val n = Sqlite.nRows(id)
      for (k <- 0 until n) {
        val rid = (k + 1).toLong
        assert(byKey(("docs", rid, 0L)).i_val.contains(rid), s"db $id row $k IPK")
        assert(byKey(("docs", rid, 1L)).s_val.contains(Sqlite.titleOf(id, k)), s"db $id row $k title")
        assert(byKey(("docs", rid, 2L)).i_val.contains(Sqlite.scoreOf(id, k)), s"db $id row $k score")
        assert(byKey(("docs", rid, 3L)).r_val.contains(Sqlite.ratioOf(id, k)), s"db $id row $k ratio")
        assert(byKey(("docs", rid, 4L)).s_val.contains(
          Sqlite.blobOf(id, k).map("%02x".format(_)).mkString), s"db $id row $k blob")
        val note = byKey(("docs", rid, 5L))
        Sqlite.noteOf(id, k) match {
          case Some(s) => assert(note.vtype == "s" && note.s_val.contains(s), s"db $id row $k note")
          case None => assert(note.vtype == "z" && note.s_val.isEmpty, s"db $id row $k null note")
        }
      }
      for (k <- 0 until 2) {
        val rid = (k + 1).toLong
        assert(byKey(("tags", rid, 0L)).s_val.contains(Sqlite.tagOf(id, k)), s"db $id tag $k")
        assert(byKey(("tags", rid, 1L)).i_val.contains(Sqlite.weightOf(id, k)), s"db $id weight $k")
        // notes: the IPK alias sits at column 1 — DDL-resolved, not col 0
        assert(byKey(("notes", rid, 0L)).s_val.contains(
          Sqlite.tagOf(id, k).replace("tag-", "note-")), s"db $id note $k")
        assert(byKey(("notes", rid, 1L)).i_val.contains(rid), s"db $id note IPK $k")
      }
      // the big table's single row ALWAYS rides an overflow chain —
      // recovering it bitwise proves the chain reassembly
      assert(byKey(("big", 1L, 0L)).s_val.contains(Sqlite.bodyOf(id)), s"db $id overflow body")
      // the auto-index catalog row (every third db, NULL sql) contributes
      // no data rows — the reader skips it rather than quarantining
      assert(!rows.exists(_.tbl == "sqlite_autoindex_docs_1"), s"db $id index skipped")
      assert(rows.length == 6 * n + 9, s"db $id cell count")
      // page census: interior root exists when docs spans multiple leaves
      val pages = db.length / 512
      if ((1 until pages).exists(p => (db(p * 512) & 0xff) == 0x05)) sawInterior = true
      else sawSingleLeaf = true
    }
    assert(sawInterior, "multi-leaf + interior-root databases occurred")
    assert(sawSingleLeaf, "single-leaf databases occurred")
    // chains of MORE than one overflow page occur (payload − local > U−4)
    assert((0L until 96L).exists(id => Sqlite.bodyOf(id).getBytes("UTF-8").length >= 1100),
      "multi-page overflow chains occurred")
  }

  test("serial-type arms all occur across the sweep") {
    val ids = 0L until 96L
    assert(ids.exists(i => (0 until Sqlite.nRows(i)).exists(k => Sqlite.scoreOf(i, k) == 0L)), "serial 8")
    assert(ids.exists(i => (0 until Sqlite.nRows(i)).exists(k => Sqlite.scoreOf(i, k) == 1L)), "serial 9")
    assert(ids.exists(i => (0 until Sqlite.nRows(i)).exists(k => Sqlite.scoreOf(i, k) < -255)), "negative multi-byte int")
    assert(ids.exists(i => (0 until Sqlite.nRows(i)).exists(k => Sqlite.noteOf(i, k).isEmpty)), "NULL arm")
    assert(ids.exists(i => (0 until Sqlite.nRows(i)).exists(k => Sqlite.titleOf(i, k).contains("é"))), "UTF-8 hazard")
  }

  test("damage ladder: bad magic, wrong encoding, page-type garbage, truncation quarantine") {
    val id = 5L
    val good = Sqlite.renderSqlite(id)
    assert(Sqlite.parseSqliteSafe(id, good).nonEmpty)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Sqlite.parseSqliteSafe(id, mut(0, 'X'.toByte)).isEmpty, "magic")
    assert(Sqlite.parseSqliteSafe(id, mut(59, 2.toByte)).isEmpty, "UTF-16 encoding (offset 56 u32 = 2)")
    assert(Sqlite.parseSqliteSafe(id, mut(100, 0x0A.toByte)).isEmpty, "index page as catalog root")
    assert(Sqlite.parseSqliteSafe(id, mut(20, 32.toByte)).isEmpty, "reserved bytes")
    assert(Sqlite.parseSqliteSafe(id, good.take(good.length - 100)).isEmpty, "truncated file")
    assert(Sqlite.parseSqliteSafe(id, Array.emptyByteArray).isEmpty)
    // rowid order violation: swap the two cell pointers of the notes leaf
    // (located by content scan — trailing pages are now the overflow chain)
    val notesBase = (1 until good.length / 512).collectFirst {
      case p if (good(p * 512) & 0xff) == 0x0D &&
        new String(good, p * 512, 512, "ISO-8859-1").contains("note-") => p * 512
    }.get
    val swapped = good.clone()
    for (i <- 0 until 2) {
      swapped(notesBase + 8 + i) = good(notesBase + 10 + i)
      swapped(notesBase + 10 + i) = good(notesBase + 8 + i)
    }
    assert(Sqlite.parseSqliteSafe(id, swapped).isEmpty, "descending rowids quarantine")
    // a cell pointer aimed INTO the pointer array itself must quarantine,
    // never parse header bytes as a record
    val lowPtr = good.clone()
    lowPtr(notesBase + 8) = 0; lowPtr(notesBase + 9) = 9 // offset 9 < content area
    assert(Sqlite.parseSqliteSafe(id, lowPtr).isEmpty, "pointer into header quarantines")
  }

  test("overflow damage ladder: early end, out-of-range page, cycle quarantine") {
    // an id whose chain spans ≥2 overflow pages, so a broken link is
    // observable mid-chain
    val id = (0L until 96L).find(i => Sqlite.bodyOf(i).getBytes("UTF-8").length >= 1100).get
    val good = Sqlite.renderSqlite(id)
    assert(Sqlite.parseSqliteSafe(id, good).nonEmpty)
    val pages = good.length / 512
    // the big leaf is the page whose content carries the body prefix; the
    // chain is the trailing pages after it
    // scan index p addresses the page at byte p*512, i.e. page NUMBER p+1
    val bigIdx = (1 until pages).collectFirst {
      case p if (good(p * 512) & 0xff) == 0x0D &&
        new String(good, p * 512, 512, "ISO-8859-1").contains(s"big $id: ") => p
    }.get
    val firstOvpNo = bigIdx + 2 // the page right after the big leaf
    val firstOvpBase = (firstOvpNo - 1) * 512
    def setNext(buf: Array[Byte], pageBase: Int, v: Int): Unit = {
      buf(pageBase) = ((v >>> 24) & 0xff).toByte; buf(pageBase + 1) = ((v >> 16) & 0xff).toByte
      buf(pageBase + 2) = ((v >> 8) & 0xff).toByte; buf(pageBase + 3) = (v & 0xff).toByte
    }
    // chain ends before the payload does
    val early = good.clone()
    setNext(early, firstOvpBase, 0)
    assert(Sqlite.parseSqliteSafe(id, early).isEmpty, "early chain end quarantines")
    // next pointer leaves the file
    val oob = good.clone()
    setNext(oob, firstOvpBase, pages + 50)
    assert(Sqlite.parseSqliteSafe(id, oob).isEmpty, "out-of-range overflow page quarantines")
    // self-cycle
    val cyc = good.clone()
    setNext(cyc, firstOvpBase, firstOvpNo)
    assert(Sqlite.parseSqliteSafe(id, cyc).isEmpty, "overflow cycle quarantines")
  }

  test("ipkColIndex: DDL-resolved position, DESC exclusion, no substring traps") {
    assert(Sqlite.ipkColIndex("CREATE TABLE t(a INTEGER PRIMARY KEY, b TEXT)").contains(0))
    assert(Sqlite.ipkColIndex("CREATE TABLE t(a TEXT, b INTEGER PRIMARY KEY)").contains(1))
    assert(Sqlite.ipkColIndex("CREATE TABLE t(a TEXT, b integer primary key)").contains(1))
    assert(Sqlite.ipkColIndex("CREATE TABLE t(a TEXT, b INTEGER PRIMARY KEY DESC)").isEmpty,
      "DESC is not a rowid alias per SQLite")
    assert(Sqlite.ipkColIndex("CREATE TABLE t(a TEXT, b INT)").isEmpty)
    assert(Sqlite.ipkColIndex(
      "CREATE TABLE t(a TEXT, c CHECK (length(a) > 1), b INTEGER PRIMARY KEY)").contains(2),
      "parenthesized constraint must not break the top-level comma split")
  }

  test("operator: damaged database quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Sqlite.encodeSqlite(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 13L) (id, b.take(700)) else (id, b)
    }.toDF("doc_id", "db")
    val got = Sqlite.sqliteRows(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(13L))
    for (id <- (0L until 24L) if id != 13L)
      assert(byDoc(id).length == 6 * Sqlite.nRows(id) + 9, s"db $id")
  }
}
