package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ======== Dremel record shredding (repetition/definition levels) ========
  *
  * The columnar-storage algorithm underneath every parquet file this
  * engine reads (Melnik et al., "Dremel: Interactive Analysis of
  * Web-Scale Datasets", VLDB 2010, §4.2): a nested record shreds into
  * one flat (repetition level, definition level, value) stream per leaf
  * — `r` says how deep in the repetition ancestry a new element starts
  * (0 = new record), `d` says how much of the optional/repeated path is
  * actually present — and a finite-state reassembly walk reconstructs
  * the records from the streams alone. Implementing it directly (not
  * just reading parquet through Spark) pins the engine's understanding
  * of its own storage layer under the bitwise gate.
  *
  * Test schema over the corpus (the paper's Name.Language.Code shape,
  * instantiated on text):
  *
  *   doc { words: repeated {
  *           code:  optional INT  — the word length, PRESENT iff j % 3 != 0
  *           chars: repeated INT  — the word's codepoints, EMPTY iff j % 4 == 0 } }
  *
  * (1-based word index j; the arms are engineered so the corpus
  * exercises every level combination the two leaves admit: code d∈{1,2},
  * chars d∈{1,2}, r∈{0,1} for code and r∈{0,1,2} for chars. The
  * record-level-missing arm (d = 0, an empty document) is out of corpus
  * scope — empty docs are dropped by the same normalize-nonempty gate
  * as [[Wordpiece]] — and covered by the spec directly.)
  *
  * Leaf streams:
  *  - `code` (max r 1, max d 2): per word, r = 0 for the record's first
  *    word else 1; d = 2 with value when present, d = 1 value NULL when
  *    the optional field is absent.
  *  - `chars` (max r 2, max d 2): per char, r = 0 for the record's very
  *    first entry, 1 for the first entry of a later word, 2 within a
  *    word; an empty list emits ONE d = 1 NULL entry carrying the
  *    word-boundary r (exactly how parquet encodes an empty repeated
  *    group).
  *
  * Output per doc folds each stream into an order-sensitive checksum
  * (entries encoded as `(r·4+d)·2^18 + v`, folded c := (c·31 + enc)
  * mod 2^31−1), plus a REASSEMBLED checksum computed by running the
  * reassembly walk over the two streams alone and folding the
  * reconstructed words — which the oracle recomputes DIRECTLY from the
  * source text, so a shred bug that loses an element, a level slip, or
  * a reassembly FSM bug each fail independently (the stream checksums
  * pin the levels; the reassembled checksum pins the round trip).
  *
  * 100 TB shape: MAP-ONLY — one typed map per document, no explode, no
  * shuffle (the [[Wordpiece]] convention). Values cap at 2^18 via
  * `codepoint mod 2^16` (checksum injectivity is not required; the
  * corpus is BMP anyway).
  */
object Dremel {

  val FoldPrime = 2147483647L
  private val NullV = 262143L // (r·4+d) slot with an 18-bit all-ones value

  /** Stream-entry encode: (r·4+d)·2^18 + v, v ∈ [0, 2^18). */
  def enc(r: Int, d: Int, v: Long): Long = (r * 4 + d).toLong * 262144L + v

  private def fold(c: Long, e: Long): Long = (c * 31 + e) % FoldPrime

  final case class Entry(r: Int, d: Int, v: Long) // v = NullV when d < 2

  /** Shred one record (its word list) into the two leaf streams. */
  def shred(words: Seq[String]): (Seq[Entry], Seq[Entry]) = {
    val code = Seq.newBuilder[Entry]
    val chars = Seq.newBuilder[Entry]
    var j = 0
    words.foreach { w =>
      j += 1
      val wordR = if (j == 1) 0 else 1
      code += (if (j % 3 != 0) Entry(wordR, 2, w.codePointCount(0, w.length).toLong)
               else Entry(wordR, 1, NullV))
      if (j % 4 == 0) chars += Entry(wordR, 1, NullV)
      else {
        var first = true
        val it = w.codePoints().iterator()
        while (it.hasNext) {
          val cp = it.next()
          chars += Entry(if (first) wordR else 2, 2, (cp % 65536).toLong)
          first = false
        }
      }
    }
    (code.result(), chars.result())
  }

  /** Reassembly walk over the two streams ALONE (no access to the source
    * record): yields per word (code value or NullV, fold of its chars).
    * Malformed streams (levels that cannot arise from [[shred]]) throw —
    * the strict-decode convention of every codec in this library.
    */
  def reassemble(code: Seq[Entry], chars: Seq[Entry]): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var ci = 0
    var first = true
    code.foreach { ce =>
      val expectR = if (first) 0 else 1
      require(ce.r == expectR, s"code stream r=${ce.r}, expected $expectR")
      // consume this word's chars: one boundary entry + following r=2 entries
      require(ci < chars.length && chars(ci).r == expectR,
        s"chars stream out of sync at $ci")
      var cfold = 0L
      if (chars(ci).d == 2) {
        cfold = fold(cfold, chars(ci).v)
        ci += 1
        while (ci < chars.length && chars(ci).r == 2) {
          require(chars(ci).d == 2, "r=2 entry must carry a value")
          cfold = fold(cfold, chars(ci).v)
          ci += 1
        }
      } else { cfold = NullV; ci += 1 } // empty repeated group
      out += ((if (ce.d == 2) ce.v else NullV, cfold))
      first = false
    }
    require(ci == chars.length, s"chars stream has ${chars.length - ci} trailing entries")
    out.result()
  }

  /** Per-doc shred + reassemble verification stats:
    * (doc_id, n_code, n_chars, code_checksum, chars_checksum,
    * reassembled_checksum). Map-only; see the object scaladoc.
    */
  def shredStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val norm = lower(trim(regexp_replace(col(textCol), "[ \\t\\n\\f\\r]+", " ")))
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), norm.as("n"))
      .filter(col("n") =!= "")
      .select(col(idCol), split(col("n"), " "))
      // staging exchange (optimization guide §2.5): the shred/reassemble
      // kernel must not inherit the scan's split count — one round-robin
      // exchange of the narrow (id, tokens) rows spreads it across cores
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Seq[String])]
      .map { case (id, words) =>
        val (code, chars) = shred(words)
        val cFold = code.foldLeft(0L)((a, e) => fold(a, enc(e.r, e.d, e.v)))
        val hFold = chars.foldLeft(0L)((a, e) => fold(a, enc(e.r, e.d, e.v)))
        val re = reassemble(code, chars)
        val rFold = re.foldLeft(0L) { case (a, (cv, cf)) =>
          fold(a, (cf * 31 + (cv % FoldPrime)) % FoldPrime)
        }
        (id, code.length.toLong, chars.length.toLong, cFold, hFold, rFold)
      }
      .toDF("doc_id", "n_code", "n_chars", "code_checksum", "chars_checksum",
        "reassembled_checksum")
  }
}
