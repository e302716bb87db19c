package graft.ext

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EncodingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def fold(bytes: Int*): (Long, Long, Boolean) =
    Encoding.utf8Fold(bytes.map(_.toByte).toArray)

  test("utf8 fold: acceptance truth table over the RFC 3629 classes") {
    assert(fold() == ((0L, 0L, true)))
    assert(Encoding.utf8Fold("hello".getBytes("UTF-8")) == ((5L, 0L, true)))
    assert(Encoding.utf8Fold("héllo ☃ 🎉".getBytes("UTF-8")) == ((9L, 0L, true)))
    // boundary codepoints: U+0080, U+0800, U+FFFD, U+10FFFF
    assert(fold(0xc2, 0x80) == ((1L, 0L, true)))
    assert(fold(0xe0, 0xa0, 0x80) == ((1L, 0L, true)))
    assert(fold(0xef, 0xbf, 0xbd) == ((1L, 0L, true)))
    assert(fold(0xf4, 0x8f, 0xbf, 0xbf) == ((1L, 0L, true)))
    // overlong lead bytes C0/C1 are invalid outright
    assert(fold(0xc0, 0x80) == ((0L, 2L, false))) // lead + orphan continuation
    assert(fold(0xc1, 0xbf) == ((0L, 2L, false)))
    // overlong 3-byte: E0 requires A0..BF as first continuation — the bad
    // byte is consumed (1 invalid), the final 0x80 is then an orphan
    assert(fold(0xe0, 0x80, 0x80) == ((0L, 2L, false)))
    // CESU-style surrogate: ED A0 80 is rejected at the second byte
    assert(fold(0xed, 0xa0, 0x80) == ((0L, 2L, false)))
    assert(fold(0xed, 0x9f, 0xbf) == ((1L, 0L, true))) // U+D7FF still fine
    // F0 overlong guard and F4 plane-range guard
    assert(fold(0xf0, 0x80, 0x80, 0x80) == ((0L, 3L, false)))
    assert(fold(0xf4, 0x90, 0x80, 0x80) == ((0L, 3L, false))) // > U+10FFFF
    // F5..FF are not leads at all
    assert(fold(0xf5, 0x80) == ((0L, 2L, false)))
    assert(fold(0xff) == ((0L, 1L, false)))
    // orphan continuation, truncated tail
    assert(fold(0x80) == ((0L, 1L, false)))
    assert(fold(0xc3) == ((0L, 1L, false)))
    assert(fold(0xe2, 0x82) == ((0L, 1L, false))) // one truncated sequence
    // damage mid-stream: valid text resumes after the bad byte is consumed
    val mixed = "ab".getBytes("UTF-8") ++ Array(0x80.toByte) ++ "cd".getBytes("UTF-8")
    assert(Encoding.utf8Fold(mixed) == ((4L, 1L, false)))
  }

  test("utf8 fold: is_valid differential against the JDK's strict decoder") {
    def jdkValid(bytes: Array[Byte]): Boolean =
      try {
        StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
          .decode(java.nio.ByteBuffer.wrap(bytes))
        true
      } catch { case _: java.nio.charset.CharacterCodingException => false }
    val rnd = new scala.util.Random(19)
    var checkedInvalid = 0
    var checkedValid = 0
    (0 until 400).foreach { k =>
      val bytes =
        if (k % 2 == 0) Array.fill(rnd.nextInt(40))(rnd.nextInt(256).toByte)
        else {
          // valid text with (sometimes) one flipped byte
          val s = Seq.fill(rnd.nextInt(12))(
            Seq("a", "é", "☃", "🎉", "ж", "中")(rnd.nextInt(6))).mkString
          val b = s.getBytes("UTF-8")
          if (b.nonEmpty && rnd.nextBoolean()) {
            val i = rnd.nextInt(b.length)
            b(i) = (b(i) ^ 0xc0).toByte
          }
          b
        }
      val (cp, _, valid) = Encoding.utf8Fold(bytes)
      assert(valid == jdkValid(bytes), s"case $k: ${bytes.map(b => f"${b & 0xff}%02x").mkString(" ")}")
      if (valid) {
        val s = new String(bytes, StandardCharsets.UTF_8)
        assert(cp == s.codePointCount(0, s.length).toLong, s"case $k codepoints")
        checkedValid += 1
      } else checkedInvalid += 1
    }
    assert(checkedValid > 30 && checkedInvalid > 30, "differential must exercise both verdicts")
  }

  test("utf8Stats over Spark: corruption fixture plants real damage; stats are exact") {
    import spark.implicits._
    val docs = Seq(
      (0L, "das schöne Haus über der Straße"), // corrupted (0 % 3 == 0)
      (1L, "plain ascii only here"),
      (2L, "héllo wörld"),
      (3L, "中文文本与表情🎉混合"), // corrupted (3 % 3 == 0)
      (4L, "")).toDF("doc_id", "text")
    val bin = Multimodal.attachBinary(docs)
    val stats = Encoding.utf8Stats(Encoding.corruptBytes(bin))
      .collect().map(s => s.doc_id -> s).toMap
    assert(stats.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // uncorrupted docs are exactly their codepoint counts
    assert(stats(1L).is_valid && stats(1L).n_codepoints == 21)
    assert(stats(2L).is_valid && stats(2L).n_codepoints == 11)
    assert(stats(4L).is_valid && stats(4L).n_bytes == 0 && stats(4L).n_codepoints == 0)
    // doc 0: byte 0 (ASCII 'd') XOR 0xC0 = orphan continuation -> invalid
    assert(!stats(0L).is_valid && stats(0L).n_invalid >= 1)
    // doc 3: position 3 % n lands inside the multi-byte text -> damage
    assert(!stats(3L).is_valid)
    // n_bytes is the payload length either way
    assert(stats(0L).n_bytes == "das schöne Haus über der Straße".getBytes("UTF-8").length)
  }

  test("nfcStats: decomposed sequences compose, precomposed and ASCII are fixpoints") {
    import spark.implicits._
    val rows = Seq(
      (1L, "café"), // cafe + combining acute -> café
      (2L, "café"), // already NFC
      (3L, "plain"),
      (4L, "äô")).toDF("doc_id", "raw")
    val got = Encoding.nfcStats(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == (("café", true, 6L, 5L)))
    assert(got(2L) == (("café", false, 5L, 5L)))
    assert(got(3L) == (("plain", false, 5L, 5L)))
    assert(got(4L) == (("äô", true, 6L, 4L)))
  }

  test("nfcStats over the combining fixture: idempotent, every piece arm occurs") {
    import spark.implicits._
    val ids = (0L until 300L).toDF("doc_id")
    val withRaw = Encoding.attachCombining(ids)
    val out = Encoding.nfcStats(withRaw).collect()
    assert(out.length == 300)
    assert(out.exists(_.getBoolean(2)) && out.exists(!_.getBoolean(2)),
      "both changed and unchanged docs must occur")
    // idempotence: normalizing the normalized column changes nothing
    val again = Encoding.nfcStats(
      Encoding.nfcStats(withRaw).selectExpr("doc_id", "nfc AS raw"))
      .collect()
    assert(again.forall(!_.getBoolean(2)), "NFC must be a fixpoint of itself")
    // the fixture exercises all eight pieces across 300 ids
    val pieceSel = (0L until 300L).flatMap { id =>
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(s"n:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (1 to 3).map(i => Integer.parseInt(m.substring(i - 1, i), 16) % 8)
    }
    assert(pieceSel.toSet == (0 until 8).toSet)
  }

  test("nfkcStats: compatibility folds match the published UCD mappings") {
    import spark.implicits._
    // the UCD-literal truth table the oracle carries, checked here against
    // the JDK directly so a JDK-vs-UCD drift fails in-suite too
    val table = Seq(
      "\ufb01" -> "fi", // fi ligature
      "\uff21" -> "A", // fullwidth A
      "\u2460" -> "1", // circled one
      "\u00b2" -> "2", // superscript two
      "é" -> "é", // canonical composition inside NFKC
      "\u00bd" -> "1\u20442", // vulgar fraction -> 1 FRACTION SLASH 2
      "x" -> "x",
      "\u2126" -> "\u03a9") // ohm -> omega
    table.foreach { case (raw, expected) =>
      assert(java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFKC) == expected,
        f"U+${raw.codePointAt(0)}%04X")
    }
    // operator end-to-end over the fixture: NFKC output is a fixpoint and
    // both changed/unchanged arms occur (id 339 is an all-ASCII pick:
    // md5("k:339") selects piece 'x' three times, the identity arm)
    val withRaw = Encoding.attachCompat(((0L until 300L) :+ 339L).toDF("doc_id"))
    val out = Encoding.nfkcStats(withRaw).collect()
    assert(out.length == 301)
    assert(out.exists(_.getBoolean(2)))
    assert(out.find(_.getLong(0) == 339L).exists(r => !r.getBoolean(2) && r.getString(1) == "wxxx"))
    val again = Encoding.nfkcStats(
      Encoding.nfkcStats(withRaw).selectExpr("doc_id", "nfkc AS raw")).collect()
    assert(again.forall(!_.getBoolean(2)), "NFKC must be a fixpoint of itself")
    // NFC alone must NOT fold compatibility forms (the gap this key closes)
    assert(java.text.Normalizer.normalize("\ufb01", java.text.Normalizer.Form.NFC) == "\ufb01")
  }
}
