package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class XlsSpec extends AnyFunSuite {

  test("round-trip: sheets by lbPlyPos, SST sharing, all three cell kinds") {
    for (id <- 0L until 64L) {
      val cells = Xls.parseXls(id, Doc.renderCfb(Seq(("Workbook", Xls.renderWorkbook(id)))))
      val ns = Xls.nSheets(id)
      val expected = (0 until ns).map(s => Xls.nRows(id, s) * 3).sum
      assert(cells.length == expected, s"doc $id cell count")
      for (s <- 0 until ns; r <- 0 until Xls.nRows(id, s)) {
        val triple = cells.filter(c => c.sheet_idx == s && c.row_idx == r)
        assert(triple.length == 3, s"doc $id sheet $s row $r")
        val sc = triple.find(_.col_idx == 0).get
        assert(sc.kind == "s" && sc.s_val.contains(Xls.cellString(id, s, r)))
        assert(sc.sheet_name == Xls.sheetName(id, s))
        val nc = triple.find(_.col_idx == 1).get
        assert(nc.kind == "n" &&
          nc.num_micro.contains(Xls.numberValue(id, s, r) * 1000000L))
        val rc = triple.find(_.col_idx == 2).get
        assert(rc.kind == "rk" && rc.num_micro.contains(Xls.rkValue(id, s, r)._1))
      }
    }
  }

  test("SST deduplicates across sheets: cstTotal > cstUnique somewhere") {
    val witness = (0L until 128L).exists { id =>
      val refs = for (s <- 0 until Xls.nSheets(id); r <- 0 until Xls.nRows(id, s))
        yield Xls.cellString(id, s, r)
      refs.length > refs.distinct.length && Xls.nSheets(id) == 2
    }
    assert(witness, "fixture must exercise shared-string reuse")
    // and a UTF-16 SST string exists (the Δ arm)
    val high = (0L until 64L).exists { id =>
      (0 until Xls.nSheets(id)).exists(s => (0 until Xls.nRows(id, s)).exists(r =>
        Xls.cellString(id, s, r).exists(_ > 0xff)))
    }
    assert(high)
  }

  test("RK arms: negative integers and the div-100 multiplier both occur") {
    val arms = (0L until 64L).flatMap { id =>
      for (s <- 0 until Xls.nSheets(id); r <- 0 until Xls.nRows(id, s))
        yield Xls.rkValue(id, s, r)
    }
    assert(arms.exists { case (micro, div, _) => !div && micro < 0 })
    assert(arms.exists { case (micro, div, _) => div && micro % 1000000L != 0 })
  }

  test("damage ladder: bad BOF, SST index out of range, truncated record, Continue") {
    val id = 3L
    val wb = Xls.renderWorkbook(id)
    def pack(b: Array[Byte]) = Doc.renderCfb(Seq(("Workbook", b)))
    assert(Xls.parseXlsSafe(id, pack(wb)).nonEmpty)
    // first record must be BOF
    val noBof = wb.clone(); noBof(0) = 0x00
    assert(Xls.parseXlsSafe(id, pack(noBof)).isEmpty)
    // SST index out of range: LABELSST's isst field is 6 bytes into its
    // payload — find the first 0x00FD record and blast the index
    var p = 0
    var fdAt = -1
    while (fdAt < 0) {
      val typ = (wb(p) & 0xff) | ((wb(p + 1) & 0xff) << 8)
      val len = (wb(p + 2) & 0xff) | ((wb(p + 3) & 0xff) << 8)
      if (typ == 0x00FD) fdAt = p else p += 4 + len
    }
    val badIdx = wb.clone()
    badIdx(fdAt + 4 + 6) = 0x7f.toByte
    assert(Xls.parseXlsSafe(id, pack(badIdx)).isEmpty)
    // truncated mid-record
    assert(Xls.parseXlsSafe(id, pack(java.util.Arrays.copyOf(wb, wb.length - 3))).isEmpty)
    // BOUNDSHEET whose declared len (4) is shorter than its fixed fields:
    // the cch/flags reads must be bounds-gated (review finding)
    val shortBs = new java.io.ByteArrayOutputStream()
    shortBs.write(wb, 0, 20) // globals BOF
    shortBs.write(Array[Byte](0x85.toByte, 0x00, 0x04, 0x00, 0, 0, 0, 0)) // len=4 at stream end
    assert(Xls.parseXlsSafe(id, pack(shortBs.toByteArray)).isEmpty)
    // a Continue record in the globals quarantines (splicing unsupported)
    val cont = new java.io.ByteArrayOutputStream()
    cont.write(wb, 0, fdAt) // ends somewhere inside a sheet — rebuild simpler:
    val withCont = new java.io.ByteArrayOutputStream()
    // insert a Continue right after the globals BOF (16-byte payload + 4 hdr)
    withCont.write(wb, 0, 20)
    withCont.write(Array[Byte](0x3c, 0x00, 0x02, 0x00, 1, 2))
    withCont.write(wb, 20, wb.length - 20)
    // boundsheet positions are now stale too, but the Continue fails first
    assert(Xls.parseXlsSafe(id, pack(withCont.toByteArray)).isEmpty)
  }

  test("operator: mixed damage quarantines per workbook (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val encoded = Xls.encodeXls(docs)
    val mixed = encoded.as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 9L) (id, java.util.Arrays.copyOf(b, b.length - 100)) else (id, b)
    }.toDF("doc_id", "payload")
    val got = Xls.xlsCells(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(9L))
    for (id <- (0L until 24L) if id != 9L) {
      val expected = (0 until Xls.nSheets(id)).map(s => Xls.nRows(id, s) * 3).sum
      assert(byDoc(id).length == expected, s"doc $id")
    }
  }
}
