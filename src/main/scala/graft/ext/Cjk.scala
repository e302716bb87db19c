package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== script-aware (CJK) tokenization ========
  *
  * Every token key in the repo splits on whitespace, which under-serves
  * the scripts that don't USE whitespace: Chinese and Japanese text is
  * unsegmented, and a whitespace tokenizer sees whole sentences as one
  * "word". This module adds the standard LM-pipeline fallback — a
  * codepoint-class segmenter:
  *
  *  - '''Han''' ideographs (U+4E00–9FFF, ext-A U+3400–4DBF) emit ONE
  *    TOKEN PER CHARACTER (unigram segmentation — what CJK BPE/unigram
  *    corpora feed on when no dictionary segmenter runs);
  *  - '''hiragana''' (U+3040–309F), '''katakana''' (U+30A0–30FF) and
  *    '''hangul''' syllables (U+AC00–D7AF) emit one token per maximal
  *    SAME-SCRIPT RUN (kana and hangul are phonographic — runs are
  *    word-ish, and a hiragana→katakana boundary is a real lexical
  *    boundary in Japanese);
  *  - '''latin''' ASCII letters/digits emit one token per alphanumeric
  *    run (the existing whitespace behavior, preserved for mixed text);
  *  - everything else (punctuation — including fullwidth CJK
  *    punctuation — whitespace, symbols) separates.
  *
  * Scale shape: map-only per document (one codepoint pass), zero
  * shuffles. No reference citation — north-star scope; segmentation
  * rules are public script-range knowledge (UAX #24 script ranges).
  */
object Cjk {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ------------------------------------------------------------- fixture

  /** Fixed per-script character tables (md5 nibbles pick from them).
    * kana slots 0–3 are hiragana, 4–7 katakana — whether a doc's two
    * kana picks land in the same sub-script decides if they form one
    * run token or two, which is exactly the boundary rule under test.
    */
  private[ext] val HanChars = "\u4e2d\u6587\u6570\u636e\u6a21\u578b\u5b66\u7fd2".toCharArray // 中文数据模型学習
  private[ext] val KanaChars = Array('\u3042', '\u3044', '\u304b', '\u305f', // あいかた
    '\u30a2', '\u30ab', '\u30c7', '\u30bf') // アカデタ
  private[ext] val HangulChars = Array('\ud55c', '\uad6d', '\uc5b4', '\ub370', // 한국어데
    '\uc774', '\ud130', '\ubaa8', '\ub378') // 이터모델

  /** Closed-form mixed-script line: `ai <han><han><kana><kana> x<d>.<hangul><hangul>`
    * — a latin word, two ideographs butted against a kana pair (no
    * separator: the class boundary must split them), another latin
    * token, ideographic-comma-free punctuation, and a hangul run.
    */
  private[ext] def renderCjk(id: Long): String = {
    val m = md5Hex(s"cjk:$id")
    def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
    "ai " + HanChars(nib(1) % 8) + HanChars(nib(2) % 8) +
      KanaChars(nib(3) % 8) + KanaChars(nib(4) % 8) +
      s" x${id % 10}." + HangulChars(nib(5) % 8) + HangulChars(nib(6) % 8)
  }

  def encodeCjk(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      .as[Long]
      .map(id => (id, renderCjk(id)))
      .toDF("doc_id", "raw")
  }

  // ------------------------------------------------------------ segmenter

  /** UAX #24-range script class of one code point; null = separator.
    * The kana blocks carry a few Common codepoints that must SEPARATE,
    * not glue: U+3040 (unassigned), U+309B/309C (voiced sound marks),
    * U+30A0 (double hyphen) and U+30FB (katakana middle dot — the name
    * separator in e.g. デ・ニーロ). U+30FC (prolonged sound mark) is
    * Common-with-kana Script_Extensions and deliberately KEPT as
    * katakana so デニーロ stays one token.
    */
  private[ext] def scriptOf(cp: Int): String = {
    if ((cp >= '0' && cp <= '9') || (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) "latin"
    else if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf)) "han"
    else if (cp >= 0x3041 && cp <= 0x309f && cp != 0x309b && cp != 0x309c) "hiragana"
    else if (cp >= 0x30a1 && cp <= 0x30ff && cp != 0x30fb) "katakana"
    else if (cp >= 0xac00 && cp <= 0xd7af) "hangul"
    else null
  }

  /** Segment one string: same-script runs, except han which splits per
    * ideograph. Surrogate-pair safe (walks code points).
    */
  private[ext] def segment(text: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    var runStart = -1
    var runScript: String = null
    def flush(until: Int): Unit = {
      if (runStart >= 0) { out += ((text.substring(runStart, until), runScript)); runStart = -1 }
    }
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      val s = scriptOf(cp)
      if (s == null) flush(i)
      else if (s == "han") { // one token per ideograph
        flush(i)
        out += ((text.substring(i, i + w), "han"))
      } else if (runStart < 0 || s != runScript) {
        flush(i)
        runStart = i; runScript = s
      }
      i += w
    }
    flush(text.length)
    out.result()
  }

  final case class CjkToken(doc_id: Long, token_idx: Long, token: String, script: String)

  /** The operator: script-aware token table over a text column. */
  def cjkTokens(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "raw"): Dataset[CjkToken] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, raw) =>
        segment(raw).zipWithIndex.map { case ((t, s), i) => CjkToken(id, i.toLong, t, s) }
      }
  }
}
