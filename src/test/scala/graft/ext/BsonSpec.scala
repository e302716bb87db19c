package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class BsonSpec extends AnyFunSuite {

  test("round-trip: concatenated documents recover the closed forms") {
    for (id <- 0L until 96L) {
      val recs = Bson.parseBson(id, Bson.renderBson(id))
      assert(recs.length == Bson.nRecords(id), s"bson $id record count")
      recs.zipWithIndex.foreach { case (rec, r) =>
        assert(rec.rec_idx == r && rec.n_fields == 9, s"bson $id r$r shape")
        assert(rec.gen == Bson.genOf(id, r), s"bson $id r$r gen (int32 lane)")
        assert(rec.oid == Bson.oidOf(id, r), s"bson $id r$r oid")
        assert(rec.name == Bson.nameOf(id, r), s"bson $id r$r name")
        assert(rec.seq == Bson.seqOf(id, r), s"bson $id r$r seq")
        assert(rec.score == Bson.scoreOf(id, r), s"bson $id r$r score")
        assert(rec.ok == Bson.okOf(id, r), s"bson $id r$r ok")
        assert(rec.n_tags == 2 &&
          rec.tags == s"${Bson.tagOf(id, r, 0)},${Bson.tagOf(id, r, 1)}", s"bson $id r$r tags")
        assert(rec.meta_k == Bson.metaKOf(id, r), s"bson $id r$r meta")
        assert(rec.created_ms == Bson.createdOf(id, r), s"bson $id r$r created")
      }
    }
  }

  test("strictness: length rule, bool range, array index keys, duplicates") {
    val good = Bson.renderBson(3L)
    assert(Bson.parseBson(3L, good).nonEmpty)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    // grow the first document's declared length by one: terminator no
    // longer lands on the boundary
    assert(Bson.parseBsonSafe(3L, mut(0, ((good(0) & 0xff) + 1).toByte)).isEmpty,
      "declared length must match exactly")
    // the ok bool: find its value (after "ok\0") and set it to 2
    val okKey = Array[Byte](0x08, 'o', 'k', 0)
    val at = good.indexOfSlice(okKey)
    assert(at > 0)
    assert(Bson.parseBsonSafe(3L, mut(at + 4, 2.toByte)).isEmpty, "bool must be 0/1")
    // truncation and trailing garbage
    assert(Bson.parseBsonSafe(3L, good.take(good.length - 1)).isEmpty, "truncated tail")
    assert(Bson.parseBsonSafe(3L, good ++ Array[Byte](5, 0, 0, 0, 0)).isEmpty,
      "a trailing empty document (no _id) quarantines the dump")
    assert(Bson.parseBsonSafe(3L, Array.emptyByteArray).isEmpty)
  }

  test("array index keys must be the in-order decimal sequence") {
    // hand-craft: {_arr: ["x"]} but with key "1" instead of "0"
    def mini(arrKey: String): Array[Byte] = {
      val inner = {
        val o = new java.io.ByteArrayOutputStream()
        o.write(0x02); o.write(arrKey.getBytes("UTF-8")); o.write(0)
        o.write(2); o.write(0); o.write(0); o.write(0)
        o.write('x'); o.write(0)
        val body = o.toByteArray
        val w = new java.io.ByteArrayOutputStream()
        val t = body.length + 5
        w.write(t & 0xff); w.write((t >> 8) & 0xff); w.write(0); w.write(0)
        w.write(body, 0, body.length); w.write(0)
        w.toByteArray
      }
      val o = new java.io.ByteArrayOutputStream()
      o.write(0x04); o.write("a".getBytes("UTF-8")); o.write(0)
      o.write(inner, 0, inner.length)
      val body = o.toByteArray
      val w = new java.io.ByteArrayOutputStream()
      val t = body.length + 5
      w.write(t & 0xff); w.write((t >> 8) & 0xff); w.write(0); w.write(0)
      w.write(body, 0, body.length); w.write(0)
      w.toByteArray
    }
    // probe the structural rule directly: the doc with index key "0"
    // parses, the one with "1" dies in parseDoc itself
    val (fields, _) = Bson.parseDoc(mini("0"), 0, 0)
    assert(fields.contains("a"), "well-formed array parses")
    intercept[RuntimeException](Bson.parseDoc(mini("1"), 0, 0))
  }

  test("duplicate keys are damage") {
    val o = new java.io.ByteArrayOutputStream()
    def strElem(k: String): Unit = {
      o.write(0x02); o.write(k.getBytes("UTF-8")); o.write(0)
      o.write(2); o.write(0); o.write(0); o.write(0); o.write('v'); o.write(0)
    }
    strElem("k"); strElem("k")
    val body = o.toByteArray
    val w = new java.io.ByteArrayOutputStream()
    val t = body.length + 5
    w.write(t & 0xff); w.write((t >> 8) & 0xff); w.write(0); w.write(0)
    w.write(body, 0, body.length); w.write(0)
    assert(Bson.parseBsonSafe(1L, w.toByteArray).isEmpty, "duplicate key quarantines")
  }

  test("operator: damaged dump quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Bson.encodeBson(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 3)) else (id, b)
    }.toDF("doc_id", "bson")
    val got = Bson.bsonDocs(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    for (id <- (0L until 24L) if id != 8L)
      assert(byDoc(id).length == Bson.nRecords(id), s"bson $id")
  }
}
