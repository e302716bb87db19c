package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SentencesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("boundary truth table: terminators, quotes, openers") {
    assert(Sentences.split("One here. Two there.") == Seq("One here.", "Two there."))
    assert(Sentences.split("Really! Yes? 42 follows.") == Seq("Really!", "Yes?", "42 follows."))
    // closing quote rides with the terminator
    assert(Sentences.split("He said \"go.\" Then left.") == Seq("He said \"go.\"", "Then left."))
    // lower-case opener: no boundary
    assert(Sentences.split("wait... then more words.") == Seq("wait... then more words."))
    // quoted question mid-sentence, lower-case continuation
    assert(Sentences.split("""asked "why?" and left.""") == Seq("""asked "why?" and left."""))
    // no terminator at all: one sentence
    assert(Sentences.split("no terminator here") == Seq("no terminator here"))
    assert(Sentences.split("") == Seq())
  }

  test("abbreviation guard: honorifics hold, unknown tokens split") {
    assert(Sentences.split("See Dr. Smith today. Then rest.") ==
      Seq("See Dr. Smith today.", "Then rest."))
    assert(Sentences.split("Costs rose vs. Last year.") == Seq("Costs rose vs. Last year."))
    assert(Sentences.split("It was fine. Smith agreed.") ==
      Seq("It was fine.", "Smith agreed."), "non-abbreviation must split")
    // decimals never match (no whitespace after the dot)
    assert(Sentences.split("Pi is 3.14 roughly. Indeed.") == Seq("Pi is 3.14 roughly.", "Indeed."))
  }

  test("fixture end-to-end: spans recover exactly; every arm occurs; partition-stable") {
    import spark.implicits._
    val docs = (0L until 300L).toDF("doc_id")
    val out = Sentences.sentenceSplit(Sentences.encodeProse(docs)).collect()
    val byDoc = out.groupBy(_.doc_id)
    assert(byDoc.size == 300)
    byDoc.foreach { case (id, ss) =>
      val want = Sentences.sentencesFor(id)
      assert(ss.length == want.length, s"doc $id: ruled split must recover the sentence count")
      ss.sortBy(_.sent_idx).zip(want).foreach { case (got, w) =>
        val wb = w.getBytes("UTF-8")
        var c = 0L
        wb.foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
        assert(got.n_chars == wb.length && got.checksum == c, s"doc $id sent ${got.sent_idx}")
      }
    }
    val again = Sentences.sentenceSplit(Sentences.encodeProse(docs.repartition(11))).collect()
    assert(again.map(s => (s.doc_id, s.sent_idx, s.checksum)).sorted.toSeq ==
      out.map(s => (s.doc_id, s.sent_idx, s.checksum)).sorted.toSeq)
  }
}
