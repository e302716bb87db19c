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
