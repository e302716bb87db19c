package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ======== WordPiece subword tokenization (greedy longest-match) ========
  *
  * The BERT-family counterpart to the [[Bpe]] merge tokenizer: where BPE
  * APPLIES a learned merge table bottom-up, WordPiece segments each word
  * TOP-DOWN by greedy longest-match against a fixed vocabulary — at each
  * position take the LONGEST vocabulary piece matching the remaining
  * word, where word-initial positions draw from the start-piece set and
  * every later position from the `##`-continuation set. A word with no
  * matching piece at some position becomes a single `[UNK]` token (the
  * whole word, not the unmatched remainder — BERT semantics: partial
  * segmentations are discarded, never emitted).
  *
  * The vocabulary here is a FIXED engineered table ([[Vocab]]), not a
  * trained one, for the same reason [[Dedup.ErWeights]] fixes its
  * log-odds: WordPiece training is likelihood-EM over floats — not
  * replayable bitwise by a SQL oracle — while the APPLY phase is pure
  * integer/string work both engines can run exactly. The table is built
  * so the corpus exercises every arm: whole-word matches, multi-piece
  * splits (table → tab ##le, value → val ##ue, stream → str ##eam,
  * window → win ##dow), a single-char continuation (query → quer ##y),
  * and a guaranteed UNK (`dup` — the start single `d` is deliberately
  * absent). Out-of-alphabet words (the zh docs' CJK, if any reached
  * here) fall out as UNK too.
  *
  * Output is per-doc stats + an order-sensitive checksum: each word's
  * token stream folds as c := (c·31 + fold(token)) mod p (p = 2^31 − 1,
  * fold over the SPELLED token incl. the `##` prefix), and the doc
  * checksum is Σ c_w · w over 1-based word positions — order-aware but
  * computable by an order-free sum, so the Spark side stays map-only.
  * Bounds: c < 2^31, Σ c_w·w ≤ 2^31·W², within BIGINT for any document
  * under ~2M words (the oracle casts its HUGEINT sum back to BIGINT).
  *
  * 100 TB shape: MAP-ONLY — normalize/split as codegen'd columns, then
  * one typed map running the greedy loop per word (O(len · maxPieceLen)
  * with a per-length hash probe); no explode, no shuffle, no state. The
  * oracle replays the identical greedy walk as a recursive CTE with a
  * LATERAL longest-match probe over the same vocabulary (pieces + folds
  * generated from THIS table, so the two can never drift).
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * tokenizer; north-star LLM-pipeline scope.
  */
object Wordpiece {

  /** Checksum modulus (2^31 − 1, prime). */
  val FoldPrime = 2147483647L

  /** `(piece, isContinuation)` — continuation pieces are stored WITHOUT
    * the `##` prefix (it is spelling, not content); [[fold]] is taken
    * over the spelled form so start `x` and continuation `##x` hash
    * differently.
    */
  val Vocab: Seq[(String, Boolean)] = {
    val singles = ('a' to 'z').map(_.toString)
    val startSingles = singles.filterNot(_ == "d") // `dup` must UNK
    val multiStart = Seq(
      "tab", "val", "win", "batch", "scan", "the", "sort", "str", "agg",
      "row", "key", "fast", "slow", "small", "big", "data", "line", "part",
      "order", "group", "filter", "join", "hash", "merge", "column",
      "vector", "customer", "spark", "quer")
    val multiCont = Seq("le", "ue", "dow", "eam", "ery", "er", "ble", "ort", "an", "ow")
    (startSingles ++ multiStart).map(_ -> false) ++
      (singles ++ multiCont).map(_ -> true)
  }

  /** Base-31 char fold mod [[FoldPrime]] over the spelled token. */
  def fold(spelled: String): Long =
    spelled.foldLeft(0L)((a, ch) => (a * 31 + ch.toLong) % FoldPrime)

  val UnkFold: Long = fold("[UNK]")

  private val maxPieceLen = Vocab.map(_._1.length).max
  private val startSet: Set[String] = Vocab.collect { case (p, false) => p }.toSet
  private val contSet: Set[String] = Vocab.collect { case (p, true) => p }.toSet

  /** Greedy longest-match encode of one word: (n_tokens, n_unk, fold). */
  def encodeWord(word: String): (Long, Long, Long) = {
    var pos = 0
    var ntok = 0L
    var c = 0L
    while (pos < word.length) {
      val set = if (pos == 0) startSet else contSet
      var len = math.min(maxPieceLen, word.length - pos)
      var hit = 0
      while (hit == 0 && len >= 1) {
        if (set.contains(word.substring(pos, pos + len))) hit = len else len -= 1
      }
      if (hit == 0) return (1L, 1L, UnkFold)
      val spelled = (if (pos == 0) "" else "##") + word.substring(pos, pos + hit)
      c = (c * 31 + fold(spelled)) % FoldPrime
      ntok += 1
      pos += hit
    }
    (ntok, 0L, c)
  }

  /** Per-doc WordPiece stats over whitespace-normalized lowercased text:
    * `(doc_id, n_words, n_tokens, n_unk, checksum)`. Docs whose text
    * normalizes to empty are dropped (no words — both engines agree by
    * construction). Map-only; see the object scaladoc.
    */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val norm = lower(trim(regexp_replace(col(textCol), "[ \\t\\n\\f\\r]+", " ")))
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), norm.as("n"))
      .filter(col("n") =!= "")
      .select(col(idCol), split(col("n"), " "))
      .as[(Long, Seq[String])]
      .map { case (id, words) =>
        var nt = 0L; var nu = 0L; var cs = 0L; var w = 0L
        words.foreach { word =>
          if (word.nonEmpty) {
            w += 1
            val (t, u, c) = encodeWord(word)
            nt += t; nu += u; cs += c * w
          }
        }
        (id, w, nt, nu, cs)
      }
      .toDF("doc_id", "n_words", "n_tokens", "n_unk", "checksum")
  }
}
