package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def words(n: Int): String = Seq.fill(n)("w").zipWithIndex
    .map { case (w, i) => s"$w$i" }.mkString(" ")

  private def pack(rows: Seq[(Long, String, String)], capacity: Int, shardDocs: Int = 256) = {
    import spark.implicits._
    Packing.packSequences(rows.toDF("doc_id", "text", "lang"), capacity, shardDocs)
      .collect()
      .map(r => r.getLong(2) -> (r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap
  }

  test("next-fit-decreasing: big docs first, new bin on overflow, exact fills") {
    // tokens: doc1=6, doc2=5, doc3=4, doc4=2, capacity 8
    // NFD order: 1(6), 2(5), 3(4), 4(2)
    // bin1: 6 (6+5>8 -> close); bin2: 5 (5+4>8 -> close); bin3: 4+2=6
    val d = Seq(
      (1L, words(6), "en"), (2L, words(5), "en"), (3L, words(4), "en"), (4L, words(2), "en"))
    val got = pack(d, capacity = 8)
    assert(got(1L) == ((1L, 6L, false)))
    assert(got(2L) == ((2L, 5L, false)))
    assert(got(3L) == ((3L, 4L, false)))
    assert(got(4L) == ((3L, 6L, false)))
  }

  test("oversized docs get a bin alone with the overflow flag; packing continues after") {
    val d = Seq((1L, words(20), "en"), (2L, words(3), "en"), (3L, words(3), "en"))
    val got = pack(d, capacity = 8)
    assert(got(1L) == ((1L, 20L, true)), "oversized doc fills its own bin beyond capacity")
    assert(got(2L) == ((2L, 3L, false)) && got(3L) == ((2L, 6L, false)),
      s"packing resumes in a fresh bin: $got")
  }

  test("shards and languages pack independently; bins restart at 1") {
    val d = Seq(
      (1L, words(5), "en"), (2L, words(5), "de"),       // same id-shard, different lang
      (300L, words(5), "en"))                            // different id-shard (DIV 256)
    val got = pack(d, capacity = 8)
    assert(got.values.forall(_._1 == 1L), s"each (lang, shard) starts at bin 1: $got")
  }

  test("deterministic under repartitioning; ties in token count break by doc id") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val d = (0L until 300L).map(i => (i, words(1 + rnd.nextInt(10)), if (i % 3 == 0) "de" else "en"))
    val a = Packing.packSequences(d.toDF("doc_id", "text", "lang"), 16, 64).collect()
      .map(r => (r.getLong(2), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val b = Packing.packSequences(d.toDF("doc_id", "text", "lang").repartition(7), 16, 64).collect()
      .map(r => (r.getLong(2), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(a == b, "packing must be partition-invariant")
    // equal-size docs assign bins in id order: doc ids with the same count
    // within one shard appear in ascending id order across the bin sequence
    val ties = Seq((10L, words(4), "en"), (11L, words(4), "en"), (12L, words(4), "en"))
    val got = pack(ties, capacity = 8)
    assert(got(10L)._1 <= got(11L)._1 && got(11L)._1 <= got(12L)._1)
  }

  test("packStats: exact padding arithmetic; overflow bins contribute zero padding") {
    import spark.implicits._
    val d = Seq(
      (1L, words(6), "en"), (2L, words(5), "en"), (3L, words(4), "en"), (4L, words(2), "en"),
      (5L, words(20), "de"))
    val got = Packing.packStats(d.toDF("doc_id", "text", "lang"), capacity = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // en: bins fills 6, 5, 6 -> padding (8-6)+(8-5)+(8-6) = 7
    assert(got("en") == ((3L, 4L, 17L, 7L)), s"en roll-up: $got")
    // de: one overflow bin of 20 -> padding 0
    assert(got("de") == ((1L, 1L, 20L, 0L)), s"de roll-up: $got")
  }

  test("empty and null-gated docs") {
    import spark.implicits._
    val d = Seq((1L, "", "en"), (2L, words(3), "en"))
    val got = pack(d, capacity = 8)
    // empty text -> 0 tokens: packs into the open bin without consuming slots
    assert(got(2L)._2 == 3L && got(1L)._2 == 3L || got(1L)._2 == 0L,
      s"zero-token docs never open bins on their own weight: $got")
    val nulls = Seq((3L, null.asInstanceOf[String], "en"), (4L, words(2), null.asInstanceOf[String]))
    val gated = Packing.packSequences(
      nulls.toDF("doc_id", "text", "lang"), 8).collect()
    assert(gated.isEmpty, "null text/lang rows are excluded")
  }

  // ---- packByBudget (cumulative batch assignment) ----

  private def packBudget(rows: Seq[(Long, String, Long)], budget: Long): Map[Long, Long] = {
    import spark.implicits._
    Packing.packByBudget(
      rows.toDF("doc_id", "shard", "tok"), budget,
      partitionCols = Seq("shard"), tokensCol = col("tok"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("batch_id")).toMap
  }

  test("batches fill to the budget, overflowing by at most one doc") {
    // budget 10, tokens 4+4+4: doc 3 starts at cum 8 < 10 so it still lands
    // in batch 0 (documented overflow-by-one), doc 4 at cum 12 starts batch 1
    val got = packBudget(Seq((1L, "s", 4L), (2L, "s", 4L), (3L, "s", 4L), (4L, "s", 4L)), 10L)
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("a doc larger than the budget gets its own batch boundary") {
    val got = packBudget(Seq((1L, "s", 25L), (2L, "s", 1L), (3L, "s", 1L)), 10L)
    assert(got(1L) == 0L)
    assert(got(2L) == 2L, "doc after a 2.5x-budget doc lands past the skipped batch ids")
    assert(got(3L) == 2L)
  }

  test("packing is per-shard: shards do not share batch state") {
    val got = packBudget(Seq((1L, "a", 9L), (2L, "a", 9L), (3L, "b", 9L), (4L, "b", 9L)), 10L)
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("assignment is deterministic in doc_id order, not input order") {
    val fwd = packBudget(Seq((1L, "s", 6L), (2L, "s", 6L), (3L, "s", 6L)), 10L)
    val rev = packBudget(Seq((3L, "s", 6L), (1L, "s", 6L), (2L, "s", 6L)), 10L)
    assert(fwd == rev)
  }

  test("global packing (empty partitionCols) is rejected as a scale hazard") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Packing.packByBudget(Seq((1L, "s", 1L)).toDF("doc_id", "shard", "tok"),
        10L, partitionCols = Seq.empty, tokensCol = col("tok"))
    }
    intercept[IllegalArgumentException] {
      Packing.packByBudget(Seq((1L, "s", 1L)).toDF("doc_id", "shard", "tok"),
        0L, partitionCols = Seq("shard"), tokensCol = col("tok"))
    }
  }
}
