package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class IpynbSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.spark

  test("renderIpynb emits valid nbformat-4 JSON both escape arms round-trip") {
    import spark.implicits._
    val docs = (0L until 64L).map(i => Tuple1(i)).toDF("doc_id")
    val cells = Ipynb.ipynbCells(Ipynb.encodeIpynb(docs)).collect()
    val byDoc = cells.groupBy(_.doc_id)
    for (id <- 0L until 64L) {
      val got = byDoc(id).sortBy(_.cell_idx)
      assert(got.length == Ipynb.nCells(id), s"doc $id cell count")
      got.foreach { c =>
        val j = c.cell_idx.toInt
        assert(c.language == Ipynb.language(id), s"doc $id language")
        assert(c.cell_type == Ipynb.cellType(id, j), s"doc $id cell $j type")
        assert(c.exec_count == Ipynb.execCount(id, j), s"doc $id cell $j exec")
        assert(c.n_lines == Ipynb.nLines(id, j), s"doc $id cell $j lines")
        val text = Ipynb.cellText(id, j)
        val b = text.getBytes("UTF-8")
        var cs = 0L
        b.foreach(x => cs = (cs * 31 + (x & 0xff)) % 1000000007L)
        assert(c.n_chars == b.length && c.checksum == cs, s"doc $id cell $j text")
      }
    }
  }

  test("the escape arm differs on the wire but not in the decoded plane") {
    // é appears raw on even ids, as a \u escape on odd ids — find one of
    // each among docs whose text contains the hazard
    val even = (0L until 32L by 2).find(id => Ipynb.renderIpynb(id).contains("é"))
    val odd = (1L until 32L by 2).find(id => Ipynb.renderIpynb(id).contains("\\u00e9"))
    assert(even.nonEmpty && odd.nonEmpty)
    assert(!Ipynb.renderIpynb(odd.get).contains("é"))
  }

  test("damage quarantines per document: bad JSON, wrong nbformat, missing cells") {
    import spark.implicits._
    val good = Ipynb.renderIpynb(0L)
    val rows = Seq(
      (0L, good),
      (1L, good.dropRight(5)), // truncated JSON
      (2L, good.replace("\"nbformat\": 4", "\"nbformat\": 3")), // v3
      (3L, "{\"nbformat\": 4}"), // no cells
      (4L, "[1, 2, 3]"), // not an object
      (5L, Ipynb.renderIpynb(5L)),
      // a cell missing `source` (and one missing cell_type): the rows must
      // quarantine, not NPE in the checksum map (review finding)
      (6L, "{\"nbformat\": 4, \"metadata\": {}, \"cells\": [{\"cell_type\": \"raw\"}]}"),
      (7L, "{\"nbformat\": 4, \"metadata\": {}, \"cells\": [{\"source\": [\"x\"]}]}"))
      .toDF("doc_id", "nb_json")
    val got = Ipynb.ipynbCells(rows).collect().map(_.doc_id).distinct.sorted
    assert(got.toSeq == Seq(0L, 5L))
  }

  test("schema projection ignores outputs and cell metadata (real notebooks carry MBs there)") {
    import spark.implicits._
    // splice a large outputs array into a code cell: the parse must not care
    val json = Ipynb.renderIpynb(0L).replace("\"outputs\": []",
      "\"outputs\": [{\"output_type\": \"stream\", \"text\": [\"" + ("x" * 500) + "\"]}]")
    val got = Ipynb.ipynbCells(Seq((0L, json)).toDF("doc_id", "nb_json")).collect()
    assert(got.length == Ipynb.nCells(0L))
  }
}
