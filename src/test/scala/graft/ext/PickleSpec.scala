package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class PickleSpec extends AnyFunSuite {

  test("round-trip: both protocol arms recover the closed forms") {
    var saw2 = false
    var saw4 = false
    for (id <- 0L until 96L) {
      val s = Pickle.scanPickle(id, Pickle.renderPickle(id))
      val proto = Pickle.protocolOf(id)
      if (proto == 2) saw2 = true else saw4 = true
      val ng = Pickle.nGlobalsOf(id)
      assert(s.protocol == proto, s"pkl $id protocol")
      assert(s.n_globals == ng, s"pkl $id globals count")
      assert(s.globals == (0 until ng).map { g =>
        val (m, n) = Pickle.globalOf(id, g)
        s"$m.$n"
      }.mkString(","), s"pkl $id globals")
      assert(s.n_reduce == ng, s"pkl $id reduce count")
      assert(s.int_sum == Pickle.countValOf(id) + Pickle.seedValOf(id), s"pkl $id ints")
      val keyBytes = "name".length + s"doc$id".length + "count".length +
        "flag".length + "seed".length + (0 until ng).map(g => s"w$g".length).sum
      val globalStrBytes =
        if (proto == 4) (0 until ng).map { g =>
          val (m, n) = Pickle.globalOf(id, g)
          m.length + n.length
        }.sum
        else 0
      assert(s.str_bytes == keyBytes + globalStrBytes, s"pkl $id string bytes")
      val expectedOps = if (proto == 2) 14 + 5 * ng else 15 + 7 * ng
      assert(s.n_opcodes == expectedOps, s"pkl $id opcode count")
    }
    assert(saw2 && saw4, "both protocol arms occur")
  }

  test("REDUCE without an attributable GLOBAL callee quarantines") {
    // }q\0 X..name.. )R. — REDUCE over a tuple callee, not a global
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x80); out.write(2)
    out.write(')') // EMPTY_TUPLE as the 'callable'
    out.write(')') // args
    out.write('R')
    out.write('.')
    assert(Pickle.scanPickleSafe(9L, out.toByteArray).isEmpty,
      "an unattributable call must quarantine")
  }

  test("frame accounting: a FRAME length disagreeing with the body quarantines") {
    val id = 1L // protocol-4 arm
    assert(Pickle.protocolOf(id) == 4)
    val good = Pickle.renderPickle(id)
    assert(Pickle.scanPickleSafe(id, good).isDefined)
    val bad = good.clone()
    bad(3) = ((bad(3) ^ 1) & 0xff).toByte // FRAME length low byte
    assert(Pickle.scanPickleSafe(id, bad).isEmpty, "frame length mismatch")
  }

  test("damage ladder: magic, unknown opcode, stack underflow, trailing bytes") {
    val id = 7L
    val good = Pickle.renderPickle(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Pickle.scanPickleSafe(id, mut(0, 0.toByte)).isEmpty, "PROTO magic")
    assert(Pickle.scanPickleSafe(id, good ++ Array[Byte]('N')).isEmpty, "trailing bytes")
    assert(Pickle.scanPickleSafe(id, good.take(good.length - 1)).isEmpty, "lost STOP")
    assert(Pickle.scanPickleSafe(id, Array[Byte](0x80.toByte, 2, '.'.toByte)).isEmpty,
      "STOP on empty stack")
    assert(Pickle.scanPickleSafe(id, Array[Byte](0x80.toByte, 2, 0x7e, '.'.toByte)).isEmpty,
      "unknown opcode")
    assert(Pickle.scanPickleSafe(id, Array.emptyByteArray).isEmpty)
  }

  test("operator: damaged pickle quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Pickle.encodePickles(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 1)) else (id, b)
    }.toDF("doc_id", "pkl")
    val got = Pickle.pickleScan(mixed).collect()
    assert(!got.exists(_.doc_id == 8L))
    assert(got.length == 23)
  }
}
