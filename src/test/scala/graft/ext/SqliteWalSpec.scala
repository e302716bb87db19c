package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class SqliteWalSpec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  test("round-trip: every fixture log recovers its closed forms") {
    for (id <- 0L until 96L) {
      val recs = SqliteWal.parseWal(id, SqliteWal.renderWal(id))
      val expected = (0 until SqliteWal.nTxnsOf(id)).flatMap { t =>
        (0 until SqliteWal.nFramesOf(id, t)).map(f => (t, f))
      }
      assert(recs.length == expected.length, s"swal $id frame count (stale tail dropped)")
      recs.zip(expected).zipWithIndex.foreach { case ((r, (t, f)), i) =>
        val nf = SqliteWal.nFramesOf(id, t)
        assert(r.frame_idx == i, s"swal $id i$i idx")
        assert(r.page_no == SqliteWal.pageNoOf(id, t, f), s"swal $id i$i page")
        assert(r.db_size == (if (f == nf - 1) SqliteWal.dbSizeOf(id, t) else 0L), s"swal $id i$i size")
        assert(r.is_commit == (f == nf - 1), s"swal $id i$i commit")
        assert(r.big_endian == SqliteWal.isBigEndian(id), s"swal $id i$i order")
        assert(r.ckpt_seq == SqliteWal.ckptSeqOf(id), s"swal $id i$i ckpt")
        assert(r.page_md5 == md5(SqliteWal.pageOf(id, t, f)), s"swal $id i$i page md5")
      }
    }
  }

  test("the recovery rule: a stale-salt tail is ignored, not damage") {
    // id = 0, 3, 6... plant a stale frame; its page must NOT surface
    val id = 3L
    assert(SqliteWal.hasStaleTail(id))
    val recs = SqliteWal.parseWal(id, SqliteWal.renderWal(id))
    assert(!recs.exists(_.page_no == 9), "the stale frame is dropped")
    // a checksum-broken frame also ends the log: flip a byte in the LAST
    // valid frame's page; that frame (and only it) drops
    val good = SqliteWal.renderWal(1L) // no stale tail
    val before = SqliteWal.parseWal(1L, good)
    val bad = good.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    val after = SqliteWal.parseWal(1L, bad)
    assert(after.length == before.length - 1, "a torn final frame ends the valid prefix")
  }

  test("header rules: magic, format, page size, header checksum") {
    val good = SqliteWal.renderWal(2L)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(SqliteWal.parseWalSafe(2L, mut(3, 0x00)).isEmpty, "wrong magic")
    assert(SqliteWal.parseWalSafe(2L, mut(7, 0x00)).isEmpty, "wrong format version")
    assert(SqliteWal.parseWalSafe(2L, mut(11, 0x01)).isEmpty, "non-power-of-two page size")
    // corrupt the header checksum itself
    assert(SqliteWal.parseWalSafe(2L, mut(24, (good(24) ^ 1).toByte)).isEmpty,
      "header checksum verified")
    assert(SqliteWal.parseWalSafe(2L, good.take(16)).isEmpty, "truncated header")
  }

  test("both checksum word orders round-trip") {
    assert(SqliteWal.isBigEndian(0L) && !SqliteWal.isBigEndian(1L))
    Seq(0L, 1L).foreach { id =>
      assert(SqliteWal.parseWalSafe(id, SqliteWal.renderWal(id)).nonEmpty, s"order arm $id")
    }
  }

  test("a mid-log checksum break truncates there (valid prefix only)") {
    val id = 4L // >= 2 txns for most ids; check and skip if single-frame
    val good = SqliteWal.renderWal(id)
    val recs = SqliteWal.parseWal(id, good)
    if (recs.length >= 2) {
      // flip a byte in the FIRST frame's page: everything from frame 0 on drops,
      // leaving an empty prefix -> fixture-contract damage
      val bad = good.clone()
      bad(32 + 24 + 3) = (bad(32 + 24 + 3) ^ 1).toByte
      assert(SqliteWal.parseWalSafe(id, bad).isEmpty,
        "an empty valid prefix quarantines (fixture contract)")
    }
  }

  test("a checksum-VALID frame with page 0 ends the log, keeping the prefix") {
    // sqlite's documented recovery treats ANY invalid frame as
    // end-of-log — including one whose checksum chains correctly but
    // whose page number is impossible; the prefix before it survives
    val id = 1L
    val be = SqliteWal.isBigEndian(id)
    val good = SqliteWal.renderWal(id)
    val before = SqliteWal.parseWal(id, good)
    def be32(b: Array[Byte], p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    def put32(b: Array[Byte], p: Int, v: Long): Unit = {
      b(p) = ((v >> 24) & 0xff).toByte; b(p + 1) = ((v >> 16) & 0xff).toByte
      b(p + 2) = ((v >> 8) & 0xff).toByte; b(p + 3) = (v & 0xff).toByte
    }
    val pageSize = be32(good, 8).toInt
    val frameSize = 24 + pageSize
    // recompute the cumulative checksum over the whole valid log
    var (s1, s2) = SqliteWal.walChecksum(good, 0, 24, be, 0L, 0L)
    var p = 32
    while (p + frameSize <= good.length) {
      val (a1, a2) = SqliteWal.walChecksum(good, p, p + 8, be, s1, s2)
      val (c1, c2) = SqliteWal.walChecksum(good, p + 24, p + frameSize, be, a1, a2)
      s1 = c1; s2 = c2
      p += frameSize
    }
    val frame = new Array[Byte](frameSize)
    put32(frame, 0, 0L) // pno 0: impossible
    put32(frame, 4, 0L)
    put32(frame, 8, be32(good, 16)) // matching salts
    put32(frame, 12, be32(good, 20))
    val (a1, a2) = SqliteWal.walChecksum(frame, 0, 8, be, s1, s2)
    val (c1, c2) = SqliteWal.walChecksum(frame, 24, frameSize, be, a1, a2)
    put32(frame, 16, c1)
    put32(frame, 20, c2)
    val extended = good ++ frame
    assert(SqliteWal.parseWal(id, extended) == before,
      "valid prefix must survive a chained-but-impossible frame")
  }
}
