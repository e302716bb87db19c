package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("quality features on a known string") {
    // text: "The cat is on the mat!" -> 22 chars, 6 tokens
    val r = TextAnalysis.quality(docs(1L -> "The cat is on the mat!")).collect().head
    assert(r.getLong(1) == 22) // n_chars
    assert(r.getLong(2) == 6) // n_tokens
    assert(math.abs(r.getDouble(3) - 16.0 / 22) < 1e-12, "alpha ratio") // 16 letters
    assert(math.abs(r.getDouble(4) - 1.0 / 22) < 1e-12, "punct ratio") // '!'
    // stopwords among [the, cat, is, on, the, mat!]: the, is, on, the = 4
    // ("mat!" is not 'mat', tokens keep punctuation)
    assert(math.abs(r.getDouble(5) - 4.0 / 6) < 1e-12, "stopword ratio")
    // distinct tokens: the, cat, is, on, mat! = 5
    assert(math.abs(r.getDouble(6) - 5.0 / 6) < 1e-12, "distinct ratio")
  }

  test("empty text is guarded to zero ratios, not NaN/null") {
    val r = TextAnalysis.quality(docs(1L -> "")).collect().head
    assert(r.getLong(1) == 0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    assert(!r.isNullAt(5) && !r.isNullAt(6))
  }

  test("language id picks the marker-richest lexicon") {
    val out = TextAnalysis.langId(docs(
      1L -> "der hund ist nicht ein vogel und das haus",
      2L -> "le chat est dans la maison et les jardins",
      3L -> "the dog is in the house and it is a good day",
      4L -> "el perro es una mascota y los gatos")).collect()
    val pred = out.map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(pred == Map(1L -> "de", 2L -> "fr", 3L -> "en", 4L -> "es"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = TextAnalysis.tokenCounts(docs(1L -> "abc 123 x!y")).collect().head
    assert(r.getLong(1) == 3) // ws tokens
    assert(r.getLong(2) == 5) // abc, 123, x, !, y
  }

  test("vocabulary: top-k by frequency, lexicographic ties, empty tokens excluded") {
    val out = TextAnalysis.vocabulary(
      docs(1L -> "b b b a a c", 2L -> "a c d", 3L -> "   "), topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // a:3, b:3 (tie -> a first), c:2; d cut at k=3; blank doc contributes nothing
    assert(out.toSeq == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("fingerprints: whitespace/case-insensitive md5; rolling hash within modulus") {
    val out = TextAnalysis.fingerprints(docs(1L -> "A  b\tC", 2L -> "a b c")).collect()
    val byId = out.map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(1L) == byId(2L), "same normalized content must fingerprint identically")
    assert(byId(1L)._2 >= 0 && byId(1L)._2 < TextAnalysis.rollingHashMod)
  }
}
