package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("bpe: spelling is codepoint-wise with the ▁ word boundary") {
    assert(Bpe.spell("ab c") == "a b ▁ c")
    assert(Bpe.spell("") == "")
    // an astral emoji is ONE symbol, not two UTF-16 code units
    assert(Bpe.spell("a🎉b") == "a 🎉 b")
  }

  test("bpe: merges fire in priority order and compose") {
    // 't h' -> 'th', then 'th e' -> 'the'
    assert(Bpe.tokenize("the").toSeq == Seq("the"))
    // 'i n' -> 'in', 'in g' -> 'ing'
    assert(Bpe.tokenize("ing").toSeq == Seq("ing"))
    // unmerged codepoints stay single symbols
    assert(Bpe.tokenize("xz").toSeq == Seq("x", "z"))
    // boundary-aware rules: 'the' absorbs a following word boundary
    assert(Bpe.tokenize("the x").toSeq.head.startsWith("the"))
  }

  test("bpe: lossless — tokens concatenate back to the original text") {
    val rnd = new scala.util.Random(53)
    val corpus = Seq(
      "the quick brown fox jumps over the lazy dog",
      "standing in the rain with his head hung low",
      "ünïcödé ✓ and emoji 🎉 mixed in",
      "a", "", "   ", "aaaaaaa bbbbbbb",
      (0 until 200).map(_ => "abcdefgh ▁the"(rnd.nextInt(13))).mkString)
    corpus.foreach { text =>
      val tokens = Bpe.tokenize(text)
      val rebuilt = tokens.mkString("").replace('▁', ' ')
      assert(rebuilt == text.replace('▁', ' '), s"lossless violated for: $text")
      if (text.nonEmpty)
        assert(tokens.length <= text.codePointCount(0, text.length), "merging can only shrink")
    }
  }

  test("bpe: merged stream is deterministic and compresses real English") {
    val text = "the thing standing in the north is thinking of another theory"
    val t1 = Bpe.tokenize(text)
    val t2 = Bpe.tokenize(text)
    assert(t1.toSeq == t2.toSeq)
    val chars = text.codePointCount(0, text.length)
    assert(t1.length < chars * 2 / 3, s"merge table should compress: ${t1.length} of $chars")
  }

  /** Driver-side replica of the training loop — an independent
    * implementation the distributed one must match round for round.
    */
  private def referenceTrain(texts: Seq[String], rounds: Int): Seq[(Long, String, Long)] = {
    var corpus = texts.map(Bpe.spell)
    (1 to rounds).map { k =>
      val counts = corpus.flatMap { s =>
        if (s.isEmpty) Nil
        else s.split(' ').sliding(2).filter(_.length == 2).map(w => w(0) + " " + w(1)).toSeq
      }.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      def md5hex(s: String): String = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        d.map(b => f"${b & 0xff}%02x").mkString
      }
      val (pair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, md5hex(p)) }
      corpus = corpus.map(_.replace(pair, pair.replace(" ", "")))
      (k.toLong, pair, cnt)
    }
  }

  test("bpe train: distributed loop equals the driver-side reference round for round") {
    import spark.implicits._
    val texts = Seq(
      "the cat and the hat sat on the mat",
      "thin things in the north",
      "a banana and an apple",
      "", "  ")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == referenceTrain(texts, 6))
    // the top merge of THIS corpus is 'th' territory: 'the/thin/things/north'
    assert(got.head._2.contains("h") || got.head._2.contains("▁"))
    // learned counts are non-increasing-ish sanity: every selected count >= 1
    assert(got.forall(_._3 >= 1))
  }

  test("bpe train: rounds past the collapse threshold still match the reference") {
    import spark.implicits._
    // 18 rounds > collapseEvery (16): exercises the fold-back-into-a-fresh-
    // cache path, whose off-by-one would silently drop or double a merge
    val texts = Seq(
      "abcdefghijklmnopqrstuvwxyz",
      "the cat and the hat sat on the mat in the north",
      "banana bandana and an anagram")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, rounds = 18)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == referenceTrain(texts, 18))
  }

  test("bpe train: exhausting the corpus raises instead of looping") {
    import spark.implicits._
    val docs = Seq((0L, "ab")).toDF("doc_id", "text") // exactly one pair to learn
    intercept[IllegalArgumentException] {
      Bpe.trainMerges(docs, rounds = 5)
    }
  }

  test("bpeStats over Spark: counts and checksum match a direct computation") {
    import spark.implicits._
    val docs = Seq((0L, "the thin band"), (1L, ""), (2L, "🎉")).toDF("doc_id", "text")
    val got = Bpe.bpeStats(docs).collect().map(s => s.doc_id -> s).toMap
    assert(got(0L).n_chars == 13)
    assert(got(0L).n_tokens == Bpe.tokenize("the thin band").length)
    val merged = Bpe.tokenize("the thin band").mkString(" ")
    var c = 0L
    merged.getBytes("UTF-8").foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
    assert(got(0L).checksum == c)
    assert(got(1L).n_chars == 0 && got(1L).n_tokens == 0 && got(1L).checksum == 0L)
    assert(got(2L).n_chars == 1 && got(2L).n_tokens == 1)
  }
}
