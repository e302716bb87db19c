package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def pack(rows: Seq[(Long, String, Long)], budget: Long): Map[Long, Long] = {
    import spark.implicits._
    Packing.packByBudget(
      rows.toDF("doc_id", "shard", "tok"), budget,
      partitionCols = Seq("shard"), tokensCol = col("tok"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("batch_id")).toMap
  }

  test("batches fill to the budget, overflowing by at most one doc") {
    // budget 10, tokens 4+4+4: doc 3 starts at cum 8 < 10 so it still lands
    // in batch 0 (documented overflow-by-one), doc 4 at cum 12 starts batch 1
    val got = pack(Seq((1L, "s", 4L), (2L, "s", 4L), (3L, "s", 4L), (4L, "s", 4L)), 10L)
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("a doc larger than the budget gets its own batch boundary") {
    val got = pack(Seq((1L, "s", 25L), (2L, "s", 1L), (3L, "s", 1L)), 10L)
    assert(got(1L) == 0L)
    assert(got(2L) == 2L, "doc after a 2.5x-budget doc lands past the skipped batch ids")
    assert(got(3L) == 2L)
  }

  test("packing is per-shard: shards do not share batch state") {
    val got = pack(Seq((1L, "a", 9L), (2L, "a", 9L), (3L, "b", 9L), (4L, "b", 9L)), 10L)
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("assignment is deterministic in doc_id order, not input order") {
    val fwd = pack(Seq((1L, "s", 6L), (2L, "s", 6L), (3L, "s", 6L)), 10L)
    val rev = pack(Seq((3L, "s", 6L), (1L, "s", 6L), (2L, "s", 6L)), 10L)
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
