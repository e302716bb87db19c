package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // ------------------------------------------------------------ viterbi

  test("viterbi: fewest tokens first, then highest score, then smallest first piece") {
    val v = Map("a" -> 5L, "b" -> 5L, "ab" -> 1L, "abc" -> 100L, "c" -> 5L, "bc" -> 9L)
    // one 3-piece vs {ab,c}/{a,bc} 2-piece vs {abc} 1-piece: fewest wins
    assert(Unigram.viterbi("abc", v) == Seq("abc"))
    // no "abcd": best 2-token split of "abcd" → need d
    val v2 = v + ("d" -> 5L) + ("cd" -> 50L) + ("abcd" -> 0L)
    // 1 token "abcd" (score 0) still beats any 2-token split — count dominates
    assert(Unigram.viterbi("abcd", v2) == Seq("abcd"))
    val v3 = v2 - "abcd"
    // now 2-token: candidates ab+cd (1+50=51), abc+d (100+5=105), a+bcd (no bcd)
    assert(Unigram.viterbi("abcd", v3) == Seq("abc", "d"))
    // equal-score tie: backtrack takes the SMALLEST final piece length
    val tie = Map("x" -> 1L, "y" -> 1L, "xy" -> 2L, "yx" -> 2L)
    // "xyx": 2 tokens either {xy, x}(2+1) or {x, yx}(1+2) — equal; last piece
    // min length → {xy, x}
    assert(Unigram.viterbi("xyx", tie) == Seq("xy", "x"))
  }

  test("viterbi: segmentation always concatenates back and only uses vocab pieces") {
    val rnd = new scala.util.Random(7)
    val letters = "abcde"
    val vocab: Map[String, Long] =
      (letters.map(c => c.toString -> rnd.nextLong(50)) ++
        Seq("ab" -> 60L, "cde" -> 80L, "bc" -> 10L, "de" -> 5L, "abcd" -> 3L)).toMap
    for (_ <- 0 until 300) {
      val n = 1 + rnd.nextInt(8)
      val w = Array.fill(n)(letters(rnd.nextInt(5))).mkString
      val seg = Unigram.viterbi(w, vocab)
      assert(seg.mkString == w, s"$w -> $seg")
      seg.foreach(p => assert(vocab.contains(p), s"$w -> $seg"))
      // optimality vs brute force on the integer objective
      def all(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Seq.empty)
        else (1 to math.min(4, s.length)).flatMap { j =>
          val (h, t) = s.splitAt(j)
          if (vocab.contains(h)) all(t).map(h +: _) else Seq.empty
        }
      val best = all(w).map(seg0 => seg0.map(p => vocab(p) - Unigram.B).sum).max
      assert(seg.map(p => vocab(p) - Unigram.B).sum == best, s"$w -> $seg not optimal")
    }
  }

  test("chunking is codepoint-exact: an astral emoji is one symbol") {
    assert(Unigram.chunksOf("ab") == Seq("ab"))
    assert(Unigram.chunksOf("abcdefghij") == Seq("abcdefgh", "ij"))
    val astral = "🎉" * 9 // 9 codepoints, 18 UTF-16 chars
    val cs = Unigram.chunksOf(astral)
    assert(cs.length == 2 && cs(0) == "🎉" * 8 && cs(1) == "🎉")
  }

  // ------------------------------------------------------------- train

  test("train: deterministic vocabulary with singles coverage and shrinking multi set") {
    import spark.implicits._
    val docs = (0L until 80L).map { i =>
      (i, s"the cat sat on the mat ${i % 7} the thing is that " * 2)
    }.toDF("doc_id", "text")
    val v1 = Unigram.train(docs).collect()
    val v2 = Unigram.train(docs).collect()
    assert(v1.toSeq == v2.toSeq, "training must be deterministic")
    assert(v1.length == 32)
    assert(v1.map(_.getLong(0)).toSeq == (1L to 32L), "dense ranks")
    // frequent words must surface as whole pieces ("the" appears everywhere)
    val pieces = v1.map(_.getString(1)).toSet
    assert(pieces.contains("the"), s"expected 'the' in $pieces")
    // scores descend in rank order (md5 only breaks exact ties)
    val scores = v1.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("segmentation parity: tokenStats equals a driver-side re-application of the trained table") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      (i, s"alpha beta gamma$i delta epsilon " + ("zeta " * (i % 4).toInt))
    }.toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(docs)
    // singles coverage: every codepoint of the corpus is in the vocab
    val corpusChars = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(' ').filter(_.nonEmpty).flatMap(_.toCharArray)).map(_.toString).toSet
    corpusChars.foreach(c => assert(vocab.contains(c), s"single '$c' missing"))
    val stats = Unigram.tokenStats(docs).collect().map(s => s.doc_id -> s).toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val seg = Unigram.segment(text, vocab)
      val chunks = text.split(' ').filter(_.nonEmpty).flatMap(Unigram.chunksOf)
      assert(stats(id).n_chunks == chunks.length.toLong, s"doc $id chunks")
      assert(stats(id).n_tokens == seg.length.toLong, s"doc $id tokens")
      assert(seg.mkString == chunks.mkString, s"doc $id concatenation")
    }
  }

  test("train guards the Viterbi bias against corpus mass overflow") {
    import spark.implicits._
    // tiny corpus passes; the guard itself is the contract (mass * 4 < B)
    val docs = Seq((0L, "ok")).toDF("doc_id", "text")
    assert(Unigram.train(docs).collect().nonEmpty)
  }
}
