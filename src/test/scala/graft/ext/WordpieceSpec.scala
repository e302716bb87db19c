package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class WordpieceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** Brute-force reference: try EVERY segmentation depth-first,
    * longest-piece-first, mirroring greedy (no backtracking). */
  private def refEncode(word: String): Seq[String] = {
    val start = Wordpiece.Vocab.collect { case (p, false) => p }.toSet
    val cont = Wordpiece.Vocab.collect { case (p, true) => p }.toSet
    val maxLen = Wordpiece.Vocab.map(_._1.length).max
    var pos = 0
    val out = Seq.newBuilder[String]
    while (pos < word.length) {
      val set = if (pos == 0) start else cont
      val hit = (math.min(maxLen, word.length - pos) to 1 by -1)
        .find(l => set.contains(word.substring(pos, pos + l)))
      hit match {
        case None => return Seq("[UNK]")
        case Some(l) =>
          out += (if (pos == 0) "" else "##") + word.substring(pos, pos + l)
          pos += l
      }
    }
    out.result()
  }

  private def foldTokens(tokens: Seq[String]): Long =
    tokens.foldLeft(0L)((a, t) => (a * 31 + Wordpiece.fold(t)) % Wordpiece.FoldPrime)

  test("greedy longest-match: corpus words split exactly as engineered") {
    assert(refEncode("table") == Seq("tab", "##le"))
    assert(refEncode("value") == Seq("val", "##ue"))
    assert(refEncode("stream") == Seq("str", "##eam"))
    assert(refEncode("window") == Seq("win", "##dow"))
    assert(refEncode("query") == Seq("quer", "##y"))
    assert(refEncode("customer") == Seq("customer"), "whole-word piece wins by length")
    assert(refEncode("dup") == Seq("[UNK]"), "missing start single 'd' must UNK the word")
    // encodeWord agrees with the reference on every corpus word
    for (w <- Seq("table", "value", "stream", "window", "query", "customer",
        "join", "hash", "dup", "a", "the")) {
      val toks = refEncode(w)
      val want = (toks.length.toLong, if (toks == Seq("[UNK]")) 1L else 0L, foldTokens(toks))
      assert(Wordpiece.encodeWord(w) == want, s"word $w")
    }
  }

  test("greedy is longest-at-each-step, not globally optimal; UNK drops partial tokens") {
    // 'querya': greedy takes quer + ##y + ##a (3 pieces)
    assert(refEncode("querya") == Seq("quer", "##y", "##a"))
    assert(Wordpiece.encodeWord("querya")._1 == 3L)
    // mid-word failure discards the tokens already built: '-' has no piece
    val (t, u, c) = Wordpiece.encodeWord("tab-le")
    assert((t, u, c) == (1L, 1L, Wordpiece.UnkFold), "whole word becomes ONE [UNK]")
    // non-ASCII start fails immediately
    assert(Wordpiece.encodeWord("数据")._2 == 1L)
  }

  test("encodeWord equals the reference on random alphabet words") {
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val w = Seq.fill(1 + rnd.nextInt(12))(('a' + rnd.nextInt(26)).toChar).mkString
      val toks = refEncode(w)
      val want = (toks.length.toLong, if (toks == Seq("[UNK]")) 1L else 0L, foldTokens(toks))
      assert(Wordpiece.encodeWord(w) == want, s"word $w -> $toks")
    }
  }

  test("tokenStats: counts, UNKs, and the position-weighted checksum") {
    import spark.implicits._
    val d = Seq(
      (1L, "table value"),        // 2 words, 4 tokens
      (2L, "value table"),        // same words, other order: checksum must differ
      (3L, "dup the dup"),        // 2 UNKs at positions 1 and 3
      (4L, "   "),                // whitespace-only: dropped
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Wordpiece.tokenStats(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    val cTable = foldTokens(Seq("tab", "##le"))
    val cValue = foldTokens(Seq("val", "##ue"))
    val cThe = foldTokens(Seq("the"))
    assert(got(1L) == (2L, 4L, 0L, cTable * 1 + cValue * 2))
    assert(got(2L) == (2L, 4L, 0L, cValue * 1 + cTable * 2))
    assert(got(1L)._4 != got(2L)._4, "checksum must be order-sensitive")
    assert(got(3L) == (3L, 3L, 2L, Wordpiece.UnkFold * 1 + cThe * 2 + Wordpiece.UnkFold * 3))
  }

  test("tokenStats normalizes whitespace runs and case; map-only partition invariance") {
    import spark.implicits._
    val d = Seq((1L, "TABLE\t\n  Value"), (2L, "table value")).toDF("doc_id", "text")
    val got = Wordpiece.tokenStats(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(got(1L) == got(2L), "case + whitespace runs must normalize away")
    val big = (0L until 200L).map(i => (i, "table value stream window query dup")).toDF("doc_id", "text")
    val a = Wordpiece.tokenStats(big.repartition(1)).collect().map(_.toSeq).toSet
    val b = Wordpiece.tokenStats(big.repartition(17)).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
