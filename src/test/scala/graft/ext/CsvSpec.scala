package graft.ext

import org.apache.spark.sql.functions.{col, length}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CsvSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def roundtrip(records: Seq[Seq[String]]): Vector[Vector[String]] =
    Csv.parseCsv(Csv.writeCsv(records.iterator)).get

  test("csv round trip: quoting, escapes, embedded separators and newlines") {
    val records = Seq(
      Seq("plain", "two words", ""),
      Seq("comma, inside", "quote \" inside", "newline\ninside"),
      Seq("\"fully quoted\"", "both, \"and\"\nall", "trailing"),
      Seq("", "", ""), // all-empty record
      Seq("crlf\r\ninside", "end"))
    assert(roundtrip(records) == records.map(_.toVector).toVector)
  }

  test("csv parse: RFC structure truth table") {
    // no trailing newline: last record still flushes
    assert(Csv.parseCsv("a,b\nc,d").get == Vector(Vector("a", "b"), Vector("c", "d")))
    // trailing newline does not invent an empty record
    assert(Csv.parseCsv("a,b\n").get == Vector(Vector("a", "b")))
    assert(Csv.parseCsv("").get == Vector.empty)
    // CRLF record separators
    assert(Csv.parseCsv("a,b\r\nc,d\r\n").get == Vector(Vector("a", "b"), Vector("c", "d")))
    // quoted empty field vs missing field
    assert(Csv.parseCsv("\"\",x\n").get == Vector(Vector("", "x")))
    assert(Csv.parseCsv(",x\n").get == Vector(Vector("", "x")))
    // doubled quote at field start
    assert(Csv.parseCsv("\"\"\"q\"\"\",x\n").get == Vector(Vector("\"q\"", "x")))
    // a single quoted field containing the record separator
    assert(Csv.parseCsv("\"a\nb\"\n").get == Vector(Vector("a\nb")))
  }

  test("csv parse: structural violations drop the shard") {
    assert(Csv.parseCsv("a\"b,c\n").isEmpty, "quote inside unquoted field")
    assert(Csv.parseCsv("\"ab\"x,c\n").isEmpty, "junk after closing quote")
    assert(Csv.parseCsv("\"never closed\n").isEmpty, "unterminated quote")
    assert(Csv.parseCsv("a\rb\n").isEmpty, "lone CR outside quotes")
    assert(Csv.parseCsv("a,b\r").isEmpty, "trailing lone CR")
  }

  test("csv differential: our writer's output parses identically through Java's split-free reading") {
    // a reference parse using java.io.StreamTokenizer is unfaithful for CSV;
    // instead assert against a hand-rolled but INDEPENDENT implementation:
    // split on newlines only when quote parity is even — the classic
    // spreadsheet rule — then unquote per field
    def independentParse(text: String): Vector[Vector[String]] = {
      val recs = Vector.newBuilder[String]
      val sb = new StringBuilder
      var quotes = 0
      text.foreach { c =>
        if (c == '"') { quotes += 1; sb.append(c) }
        else if (c == '\n' && quotes % 2 == 0) { recs += sb.toString.stripSuffix("\r"); sb.clear() }
        else sb.append(c)
      }
      if (sb.nonEmpty) recs += sb.toString
      recs.result().map { line =>
        val fs = Vector.newBuilder[String]
        val f = new StringBuilder
        var inQ = false
        var i = 0
        while (i < line.length) {
          val c = line.charAt(i)
          if (inQ) {
            if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { f.append('"'); i += 1 }
            else if (c == '"') inQ = false
            else f.append(c)
          } else {
            if (c == '"') inQ = true
            else if (c == ',') { fs += f.toString; f.clear() }
            else f.append(c)
          }
          i += 1
        }
        fs += f.toString
        fs.result()
      }
    }
    val rnd = new scala.util.Random(23)
    val alphabet = "ab,\"\ncd \t"
    (0 until 200).foreach { k =>
      val records = Seq.fill(rnd.nextInt(5) + 1)(
        Seq.fill(rnd.nextInt(4) + 1)(
          (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString))
      val text = Csv.writeCsv(records.iterator)
      assert(Csv.parseCsv(text).get == independentParse(text), s"case $k:\n$text")
      assert(Csv.parseCsv(text).get == records.map(_.toVector).toVector, s"case $k roundtrip")
    }
  }

  test("csvExtract over Spark: hostile shards parse back to exact per-record checksums") {
    import spark.implicits._
    val docs = Seq(
      (0L, "first doc text", "en", "web"),
      (1L, "zweiter Text", "de", "books"),
      (16L, "same shard as doc 0", "en", "web"),
      (17L, "same shard as doc 1", "fr", "code"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Csv.csvExtract(Csv.encodeCsvShards(docs, nShards = 16))
      .collect().map(r => (r.shard_id, r.row_idx) -> (r.n_fields, r.checksum)).toMap
    assert(got.keySet == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    assert(got.values.forall(_._1 == 5L))
    // checksum equals the direct field-join checksum for doc 1
    val joined = Seq("1", "de", "books", "zweiter Text", "q=\"books\", line\nde").mkString("\u001f")
    var c = 0L
    joined.getBytes("UTF-8").foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
    assert(got((1L, 0L))._2 == c)
  }
}
