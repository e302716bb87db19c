package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LogCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // (key, ts, seq, op, payload)
  private def apply(rows: Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String, String)],
      parts: Int = 1): Set[(Long, Long, Long, String)] = {
    import spark.implicits._
    LogCompaction.applyLog(
      rows.toDF("k", "ts", "seq", "op", "payload").repartition(parts),
      keyCols = Seq("k"), orderCols = Seq("ts", "seq"), opCol = "op",
      payloadCols = Seq("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
  }

  test("latest record wins per key; a trailing delete tombstones the key") {
    val log = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String, String)](
      (1L, 10L, 1L, "U", "a1"), (1L, 20L, 2L, "U", "a2"), // key 1: a2 survives
      (2L, 10L, 3L, "U", "b1"), (2L, 30L, 4L, "D", ""), // key 2: deleted
      (3L, 10L, 5L, "D", ""), (3L, 40L, 6L, "U", "c1")) // key 3: re-inserted after delete
    assert(apply(log) == Set((1L, 20L, 2L, "a2"), (3L, 40L, 6L, "c1")))
  }

  test("equal timestamps break by the sequence column") {
    val log = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String, String)](
      (1L, 10L, 1L, "U", "lo"), (1L, 10L, 9L, "U", "hi"))
    assert(apply(log) == Set((1L, 10L, 9L, "hi")))
  }

  test("records with null key or null order fields are dropped, not winners") {
    val log = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String, String)](
      (null, 99L, 1L, "U", "x"), (1L, null, 2L, "U", "y"), (1L, 5L, 3L, "U", "z"))
    assert(apply(log) == Set((1L, 5L, 3L, "z")))
  }

  test("result is partitioning-invariant (the aggregate totalizes the order)") {
    val log = (1 to 200).map { i =>
      (java.lang.Long.valueOf(i % 7L), java.lang.Long.valueOf(i / 3L),
        java.lang.Long.valueOf(i.toLong), if (i % 11 == 0) "D" else "U", s"p$i")
    }
    assert(apply(log, parts = 1) == apply(log, parts = 13))
  }
}
