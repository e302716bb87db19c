package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SuffixSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** Independent reference: sort the actual suffixes (by codepoint
    * sequence), fold the positions with the operator's checksum.
    */
  private def referenceChecksum(text: String): (Long, Long) = {
    val cps = text.codePoints().toArray
    val order = cps.indices.sortBy(i => cps.drop(i).toSeq)(
      math.Ordering.Implicits.seqOrdering[Seq, Int])
    var c = 0L
    order.foreach(i => c = (c * 31 + i) % 1000000007L)
    (cps.length.toLong, c)
  }

  test("suffix array: distributed prefix doubling equals brute-force suffix sort") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val texts = Seq(
      "banana",
      "mississippi",
      "aaaaaaaaaa", // all-equal: ranks resolve purely by suffix length
      "abcabcabcabcabc", // periodic
      "the quick brown fox jumps over the lazy dog",
      "ünïcödé ☃ 🎉 ünïcödé", // repeats with astral codepoints
      "x",
      new String((0 until 400).map(_ => ('a' + rnd.nextInt(4)).toChar).toArray)) // small alphabet
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Suffix.suffixArrayStats(docs, rounds = 10)
      .collect().map(s => s.doc_id -> ((s.n, s.sa_checksum))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == referenceChecksum(t), s"doc $i: $t")
    }
    // empty documents produce no row at all
    val withEmpty = (texts :+ "").zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val n2 = Suffix.suffixArrayStats(withEmpty, rounds = 10).collect().length
    assert(n2 == texts.length)
  }

  test("suffix array: determinism across runs and partitionings") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"doc $i " * (i.toInt % 7 + 1))).toDF("doc_id", "text")
    val a = Suffix.suffixArrayStats(docs.repartition(1), rounds = 10).collect()
      .map(s => s.doc_id -> s.sa_checksum).toMap
    val b = Suffix.suffixArrayStats(docs.repartition(13), rounds = 10).collect()
      .map(s => s.doc_id -> s.sa_checksum).toMap
    assert(a == b)
  }
}
