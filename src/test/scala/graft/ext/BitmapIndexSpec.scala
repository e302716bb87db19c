package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BitmapIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def df(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "source")
  }

  test("build: bit positions, word boundaries, and popcounts are exact") {
    val d = df(Seq((0L, "en", "s"), (1L, "en", "s"), (61L, "en", "s"),
      (62L, "en", "s"), (5L, "de", "s")))
    val got = BitmapIndex.build(d, "doc_id", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(("en", 0L)) == ((1L | 2L | (1L << 61), 3L)), "bits 0, 1, 61 in word 0")
    assert(got(("en", 1L)) == ((1L, 1L)), "doc 62 is bit 0 of word 1")
    assert(got(("de", 0L)) == ((1L << 5, 1L)))
  }

  test("negative ids are excluded, never wrapped into a bit position") {
    val d = df(Seq((-1L, "en", "s"), (3L, "en", "s")))
    val got = BitmapIndex.build(d, "doc_id", "lang").collect()
    assert(got.length == 1 && got.head.getLong(2) == 8L)
  }

  test("andCounts: every pair's index count equals the exact count") {
    val rnd = new scala.util.Random(83)
    val langs = Seq("en", "de", "fr"); val srcs = Seq("a", "b")
    val d = df((0L until 500L).map(i =>
      (i * 3 % 700, langs(rnd.nextInt(3)), srcs(rnd.nextInt(2)))).distinct)
    val got = BitmapIndex.andCounts(d, "doc_id", "lang", "source").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"(${r.getString(0)}, ${r.getString(1)}): index ${r.getLong(2)} != exact ${r.getLong(3)}")
    }
    val total = got.map(_.getLong(3)).sum
    assert(total == d.distinct.count())
  }

  test("compress: maximal runs form, split at container boundaries, and round-trip") {
    import spark.implicits._
    // one value over ids 0 .. 62*1030-1: words 0..1029 all full — the run
    // must split at the 1024-word container boundary (Roaring's trade)
    val ids = (0L until 62L * 1030L)
    val d = ids.map(i => (i, "en", "s")).toDF("doc_id", "lang", "source")
    val segs = BitmapIndex.compress(BitmapIndex.build(d, "doc_id", "lang")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    assert(segs.toSeq == Seq(
      (0L, 0L, 1023L, BitmapIndex.FullWord, 62L * 1024L),
      (1L, 1024L, 1029L, BitmapIndex.FullWord, 62L * 6L)),
      s"expected two container-bounded runs: ${segs.toSeq}")
    // popcount of the compressed index equals the doc count (round-trip)
    assert(segs.map(_._5).sum == ids.length.toLong)
    // a hole makes a literal: drop one doc mid-run
    val holed = ids.filterNot(_ == 100L).map(i => (i, "en", "s")).toDF("doc_id", "lang", "source")
    val hs = BitmapIndex.compress(BitmapIndex.build(holed, "doc_id", "lang")).collect()
    assert(hs.map(_.getLong(5)).sum == ids.length - 1L)
    val word1 = hs.find(r => r.getLong(2) == 1L && r.getLong(3) == 1L).get
    assert(word1.getLong(4) != BitmapIndex.FullWord, "the holed word stays a literal")
  }

  test("andCountsCompressed: identity holds over runs, literals, and boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val langs = Seq("en", "de", "fr")
    // contiguous ids so DIV-shards produce genuine fill runs; random langs
    // produce literals — the join exercises run∧run, run∧literal, both
    val d = (0L until 4000L).map(i => (i, langs(rnd.nextInt(3))))
      .toDF("doc_id", "lang")
      .withColumn("shard", org.apache.spark.sql.functions.expr("CAST(doc_id DIV 256 AS BIGINT)"))
    val got = BitmapIndex.andCountsCompressed(d, "doc_id", "shard", "lang").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"(${r.getLong(0)}, ${r.getString(1)}): compressed ${r.getLong(2)} != exact ${r.getLong(3)}")
    }
    assert(got.map(_.getLong(3)).sum == 4000L)
    // the shard index must actually compress: fewer segments than words
    val idx = BitmapIndex.build(d, "doc_id", "shard")
    val comp = BitmapIndex.compress(idx)
    assert(comp.count() < idx.count(),
      "range-clustered shards must collapse into runs")
  }

  test("the AND runs on words: disjoint values share words but intersect to zero bits") {
    // same word block, different langs: the word join matches, the AND is 0
    val d = df(Seq((0L, "en", "x"), (1L, "de", "y")))
    val got = BitmapIndex.andCounts(d, "doc_id", "lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(("en", "x")) == ((1L, 1L)))
    assert(got(("de", "y")) == ((1L, 1L)))
    assert(!got.contains(("en", "y")), "cross pairs with zero exact count are not rows")
  }
}
