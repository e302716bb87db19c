package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def run(docs: Seq[(Long, String)], k: Int) = {
    import spark.implicits._
    Coverage.greedySelect(docs.toDF("doc_id", "text"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
  }

  /** Independent greedy reference over bigram sets. */
  private def ref(docs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long)] = {
    def bigrams(t: String): Set[String] = {
      val w = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (w.length < 2) Set.empty else w.sliding(2).map(_.mkString(" ")).toSet
    }
    val gs = docs.map { case (d, t) => d -> bigrams(t) }.filter(_._2.nonEmpty).toMap
    var cov = Set.empty[String]
    val sel = Seq.newBuilder[(Long, Long, Long)]
    var r = 1L
    var done = false
    val chosen = scala.collection.mutable.Set.empty[Long]
    while (r <= k && !done) {
      val cands = gs.filterNot { case (d, _) => chosen(d) }
        .map { case (d, g) => (d, (g -- cov).size.toLong) }
        .filter(_._2 > 0)
      if (cands.isEmpty) done = true
      else {
        val (d, m) = cands.minBy { case (d, m) => (-m, d) }
        sel += ((r, d, m)); chosen += d; cov ++= gs(d); r += 1
      }
    }
    sel.result()
  }

  test("greedy picks the coverage maximizer each round, not the largest doc") {
    val docs = Seq(
      (1L, "a b c d e f"),          // 5 bigrams
      (2L, "a b c d"),              // subset of 1: gain drops to 0 after 1
      (3L, "x y z w"),              // disjoint: 3 bigrams
      (4L, "e f x y"))              // straddles 1 and 3
    val got = run(docs, 4)
    assert(got == ref(docs, 4))
    assert(got.head._2 == 1L, "round 1 takes the biggest gram set")
    assert(got.map(_._2).contains(3L), "the disjoint doc beats the subset doc")
    assert(!got.map(_._2).contains(2L), "a fully-covered subset never gets picked")
  }

  test("selection stops at saturation instead of emitting zero gains") {
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "b c"))
    val got = run(docs, 5)
    assert(got == Seq((1L, 1L, 2L)), s"doc 1 covers everything; greedy must stop: $got")
  }

  test("matches the independent reference on random corpora") {
    val rnd = new scala.util.Random(61)
    val words = ('a' to 'p').map(_.toString)
    val docs = (1L to 40L).map { d =>
      d -> Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    assert(run(docs, 8) == ref(docs, 8))
  }

  test("ties break toward the smaller doc id") {
    val docs = Seq((7L, "p q r"), (3L, "x y z"), (9L, "m n o"))
    val got = run(docs, 1)
    assert(got == Seq((1L, 3L, 2L)), s"equal gains: smallest id wins: $got")
  }
}
