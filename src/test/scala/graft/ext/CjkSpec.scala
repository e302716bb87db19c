package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CjkSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("segment: per-ideograph han, same-script runs, class boundaries, astral safety") {
    // "word中文かなアア word2" — han splits per char, kana runs split at the
    // hiragana/katakana boundary, latin runs split on whitespace
    val s = "word中文かなアア word2"
    assert(Cjk.segment(s) == Seq(
      "word" -> "latin", "中" -> "han", "文" -> "han",
      "かな" -> "hiragana", "アア" -> "katakana",
      "word2" -> "latin"))
    // hangul run + fullwidth punctuation separating
    assert(Cjk.segment("한국、어") == Seq(
      "한국" -> "hangul", "어" -> "hangul"))
    // kana-block Common codepoints separate: the katakana middle dot
    // (name separator) and double hyphen; the prolonged sound mark GLUES
    assert(Cjk.segment("ア・カ") == Seq("ア" -> "katakana", "カ" -> "katakana"))
    assert(Cjk.segment("あ゠い") == Seq("あ" -> "hiragana", "い" -> "hiragana"))
    assert(Cjk.segment("デニーロ") == Seq("デニーロ" -> "katakana"))
    // empty / separator-only / astral (outside all classes) inputs
    assert(Cjk.segment("").isEmpty)
    assert(Cjk.segment(" ,.;　").isEmpty)
    assert(Cjk.segment("a🎉b") == Seq("a" -> "latin", "b" -> "latin")) // 🎉 separates
    // ext-A ideograph is han too
    assert(Cjk.segment("㐀") == Seq("㐀" -> "han"))
  }

  test("operator over the fixture: token table matches the closed-form model") {
    import spark.implicits._
    val out = Cjk.cjkTokens(Cjk.encodeCjk((0L until 64L).toDF("doc_id")))
      .collect().groupBy(_.doc_id)
    for (id <- 0L until 64L) {
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cjk:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
      val k1 = nib(3) % 8; val k2 = nib(4) % 8
      val same = (k1 < 4) == (k2 < 4)
      val toks = out(id).sortBy(_.token_idx)
      assert(toks.length == (if (same) 6 else 7), s"doc $id")
      assert(toks(0).token == "ai" && toks(0).script == "latin")
      assert(toks(1).script == "han" && toks(2).script == "han")
      assert(toks(1).token == Cjk.HanChars(nib(1) % 8).toString)
      if (same) {
        assert(toks(3).token == s"${Cjk.KanaChars(k1)}${Cjk.KanaChars(k2)}")
        assert(toks(3).script == (if (k1 < 4) "hiragana" else "katakana"))
      } else {
        assert(toks(3).token == Cjk.KanaChars(k1).toString)
        assert(toks(4).token == Cjk.KanaChars(k2).toString)
        assert(toks(3).script != toks(4).script)
      }
      assert(toks.last.script == "hangul" &&
        toks.last.token == s"${Cjk.HangulChars(nib(5) % 8)}${Cjk.HangulChars(nib(6) % 8)}")
      assert(toks(toks.length - 2).token == s"x${id % 10}" && toks(toks.length - 2).script == "latin")
    }
  }
}
