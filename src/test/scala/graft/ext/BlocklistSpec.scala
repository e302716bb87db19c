package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  /** Ground truth: count every start offset where the pattern matches. */
  private def brute(text: String, pat: String): Long =
    (0 to text.length - pat.length).count(i => text.regionMatches(i, pat, 0, pat.length)).toLong

  test("automaton counts overlapping occurrences") {
    val ac = Blocklist.build(Seq("aa"))
    assert(ac.countAll("aaaa").toSeq == Seq(3L)) // overlapping: 0,1,2
  }

  test("substring patterns are both reported via the dict-suffix chain") {
    val ac = Blocklist.build(Seq("ab", "abab", "b"))
    val counts = ac.countAll("ababab")
    assert(counts.toSeq == Seq(3L, 2L, 3L))
  }

  test("matches brute force on a randomized corpus") {
    val pats = Seq("ab", "ba", "aba", "bab", "aabb", "b", "abba")
    val ac = Blocklist.build(pats)
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val text = Array.fill(rnd.nextInt(80))(if (rnd.nextBoolean()) 'a' else 'b').mkString
      val got = ac.countAll(text)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == brute(text, p), s"pattern '$p' in '$text'")
      }
    }
  }

  test("matchCounts: sparse per-doc counts over normalized text, map-only plan") {
    val docs = Seq(
      (1L, "The  Table   table stands"), // normalization collapses/lowers -> "the table table stands"
      (2L, "no hits here"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Blocklist.matchCounts(docs, Seq("table", "table table", "the"))
    val rows = out.collect().map(h => (h.doc_id, h.pattern) -> h.n_matches).toMap
    assert(rows == Map(
      (1L, "table") -> 2L,
      (1L, "table table") -> 1L,
      (1L, "the") -> 1L
    ))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected map-only plan, got:\n$plan")
  }
}
