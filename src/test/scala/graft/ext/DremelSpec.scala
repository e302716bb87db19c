package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import Dremel.Entry

class DremelSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("shred: the paper-shape truth table over the engineered arms") {
    // j=1: code present (1%3!=0), chars present; j=3: code ABSENT (d=1);
    // j=4: chars EMPTY (d=1 boundary entry)
    val (code, chars) = Dremel.shred(Seq("ab", "c", "de", "fg"))
    assert(code == Seq(
      Entry(0, 2, 2), // first word: r=0, code=len 2
      Entry(1, 2, 1),
      Entry(1, 1, 262143L), // j=3: optional absent -> d=1, NULL value
      Entry(1, 2, 2)))
    assert(chars == Seq(
      Entry(0, 2, 'a'.toLong), Entry(2, 2, 'b'.toLong), // word 1: r 0 then 2
      Entry(1, 2, 'c'.toLong),                          // word 2 boundary r=1
      Entry(1, 2, 'd'.toLong), Entry(2, 2, 'e'.toLong),
      Entry(1, 1, 262143L)))                            // j=4: empty repeated group
  }

  test("reassemble inverts shred on random word lists") {
    val rnd = new scala.util.Random(13)
    (0 until 100).foreach { _ =>
      val words = Seq.fill(1 + rnd.nextInt(12))(
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString)
      val (code, chars) = Dremel.shred(words)
      val re = Dremel.reassemble(code, chars)
      assert(re.length == words.length)
      words.zipWithIndex.foreach { case (w, i) =>
        val j = i + 1
        val (cv, cfold) = re(i)
        assert(cv == (if (j % 3 != 0) w.length.toLong else 262143L), s"code of word $j")
        val want =
          if (j % 4 == 0) 262143L
          else w.foldLeft(0L)((a, ch) => (a * 31 + ch.toLong) % Dremel.FoldPrime)
        assert(cfold == want, s"chars fold of word $j ($w)")
      }
    }
  }

  test("reassemble rejects streams shred cannot produce (strict decode)") {
    val (code, chars) = Dremel.shred(Seq("ab", "cd"))
    // level slip: second word's boundary claims r=2 (continuation)
    val bad1 = chars.updated(2, chars(2).copy(r = 2))
    intercept[IllegalArgumentException](Dremel.reassemble(code, bad1))
    // trailing chars after the last word
    intercept[IllegalArgumentException](
      Dremel.reassemble(code, chars :+ Entry(1, 2, 99L)))
    // NOTE dropping the LAST r=2 entry is NOT malformed — it is the valid
    // stream of a shorter second word (the code leaf is an independent
    // field, not a length cross-check): reassembly must accept it
    assert(Dremel.reassemble(code, chars.dropRight(1)).length == 2)
    // missing the second word's BOUNDARY entry desynchronizes the streams
    intercept[IllegalArgumentException](
      Dremel.reassemble(code, chars.patch(2, Nil, 1)))
    // record-level: first code entry with r=1 cannot start a record
    intercept[IllegalArgumentException](
      Dremel.reassemble(code.updated(0, code(0).copy(r = 1)), chars))
  }

  test("empty-record arm (out of corpus scope) shreds to empty streams") {
    val (code, chars) = Dremel.shred(Seq.empty)
    assert(code.isEmpty && chars.isEmpty)
    assert(Dremel.reassemble(code, chars).isEmpty)
  }

  test("shredStats: counts and checksums over a hand-checked doc; empty/null dropped") {
    import spark.implicits._
    val d = Seq((1L, "ab c de fg"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Dremel.shredStats(d).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L)
    val (code, chars) = Dremel.shred(Seq("ab", "c", "de", "fg"))
    def foldE(es: Seq[Entry]) =
      es.foldLeft(0L)((a, e) => (a * 31 + Dremel.enc(e.r, e.d, e.v)) % Dremel.FoldPrime)
    assert(got(0).getLong(1) == 4L && got(0).getLong(2) == 6L)
    assert(got(0).getLong(3) == foldE(code) && got(0).getLong(4) == foldE(chars))
    val re = Dremel.reassemble(code, chars)
    val rf = re.foldLeft(0L) { case (a, (cv, cf)) =>
      (a * 31 + ((cf * 31 + cv % Dremel.FoldPrime) % Dremel.FoldPrime)) % Dremel.FoldPrime
    }
    assert(got(0).getLong(5) == rf)
  }

  test("shredStats is map-only partition-invariant") {
    import spark.implicits._
    val d = (0L until 100L).map(i => (i, s"alpha beta gamma delta ep$i")).toDF("doc_id", "text")
    val a = Dremel.shredStats(d.repartition(1)).collect().map(_.toSeq).toSet
    val b = Dremel.shredStats(d.repartition(17)).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
