package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class XlsxSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("round-trip: every cell recovers the closed-form model across all writer arms") {
    for (id <- 0L until 64L) {
      val cells = Xlsx.parseXlsx(id, Xlsx.renderXlsx(id), 1 << 26)
      var expected = 0
      for (s <- 0 until Xlsx.nSheets(id)) expected += Xlsx.nRows(id, s) * Xlsx.nCols(id, s)
      assert(cells.length == expected, s"doc $id cell count")
      cells.foreach { cell =>
        val (ctype, text) = Xlsx.cellModel(id, cell.sheet_idx.toInt,
          cell.row_idx.toInt, cell.col_idx.toInt)
        assert(cell.sheet_name == Xlsx.sheetName(id, cell.sheet_idx.toInt), s"doc $id name")
        assert(cell.ctype == ctype && cell.text == text,
          s"doc $id sheet ${cell.sheet_idx} cell (${cell.row_idx},${cell.col_idx})")
      }
    }
  }

  test("the shared string table actually dedups (the repeated arm is interned once)") {
    // find a doc whose grid carries the repeated arm at least twice in
    // one sheet: (id+s+r+c)%5==3 for >= 2 cells
    val id = (0L until 40L).find { i =>
      (0 until Xlsx.nSheets(i)).exists { s =>
        val hits = for {
          r <- 0 until Xlsx.nRows(i, s); c <- 0 until Xlsx.nCols(i, s)
          if (i + s + r + c) % 5 == 3
        } yield 1
        hits.length >= 2
      }
    }.get
    val files = Zip.parseArchiveFiles(Xlsx.renderXlsx(id), 1 << 26)
    val sst = new String(files.find(_._1 == "xl/sharedStrings.xml").get._2, "UTF-8")
    val repeated = s"Repeated of sheet "
    // the sheet-constant appears ONCE per sheet in the table despite
    // multiple referencing cells
    val occurrences = repeated.r.findAllIn(sst).length
    assert(occurrences == (0 until Xlsx.nSheets(id)).count { s =>
      (for { r <- 0 until Xlsx.nRows(id, s); c <- 0 until Xlsx.nCols(id, s) }
        yield (id + s + r + c) % 5).contains(3L)
    })
  }

  test("foreign worksheet shapes: pretty-printing, str cells, missing t, gaps in the grid") {
    val shared = Vector("zero", " one ")
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="B1" t="s">
        |        <v>0</v>
        |      </c>
        |      <c r="D1"><v> 42 </v></c>
        |    </row>
        |    <row r="3">
        |      <c r="A3" t="str"><v>=SUM()</v></c>
        |      <c r="C3" t="s"><v>1</v></c>
        |    </row>
        |  </sheetData>
        |</worksheet>
        |""".stripMargin
    val cells = Xlsx.parseSheet(sheet, shared)
    assert(cells == Vector(
      (0, 1, "s", "zero"), (0, 3, "n", "42"),
      (2, 0, "str", "=SUM()"), (2, 2, "s", " one ")))
    // shared index past the table quarantines
    intercept[RuntimeException](Xlsx.parseSheet(sheet.replace("<v>1</v>", "<v>9</v>"), shared))
    // a ref disagreeing with its row quarantines
    intercept[RuntimeException](Xlsx.parseSheet(sheet.replace("\"C3\"", "\"C9\""), shared))
    // review-pass regressions:
    // a value-less styled cell (routine Excel output) is SKIPPED, not fatal
    val withEmpty = sheet.replace("<c r=\"D1\"><v> 42 </v></c>",
      "<c r=\"C1\" s=\"3\"/><c r=\"D1\"><v> 42 </v></c>")
    assert(Xlsx.parseSheet(withEmpty, shared) == cells)
    // a declared string cell with no value IS damage
    intercept[RuntimeException](Xlsx.parseSheet(
      sheet.replace("<c r=\"D1\"><v> 42 </v></c>", "<c r=\"D1\" t=\"s\"/>"), shared))
    // inline strings follow the same xml:space rule as the shared table
    val inlinePretty =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData><row r="1">
        |<c r="A1" t="inlineStr"><is><t>
        |    wrapped
        |  </t></is></c>
        |<c r="B1" t="inlineStr"><is><r><t xml:space="preserve"> kept</t></r><r><t>tail</t></r></is></c>
        |</row></sheetData>
        |</worksheet>
        |""".stripMargin
    assert(Xlsx.parseSheet(inlinePretty, Vector.empty) == Vector(
      (0, 0, "inlineStr", "wrapped"), (0, 1, "inlineStr", " kepttail")))
  }

  test("shared strings: rich-text runs concatenate; preserve kept, default trimmed") {
    val sst =
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |  <si><t>plain</t></si>
        |  <si><r><rPr><b/></rPr><t xml:space="preserve"> bold</t></r><r><t> tail </t></r></si>
        |  <si><t>
        |    wrapped
        |  </t></si>
        |</sst>
        |""".stripMargin
    assert(Xlsx.parseSharedStrings(sst) == Vector("plain", " boldtail", "wrapped"))
  }

  test("OPC strictness: each violation quarantines the whole workbook") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def parse(b: Array[Byte]) =
      try Xlsx.parseXlsx(1L, b, 1 << 26) catch { case scala.util.control.NonFatal(_) => Nil }
    def rebuild(id: Long)(f: Seq[(String, Array[Byte], Int)] => Seq[(String, Array[Byte], Int)]): Array[Byte] = {
      val entries = Zip.parseArchiveFiles(Xlsx.renderXlsx(id), 1 << 26)
      Zip.buildZip(f(entries))
    }
    assert(parse(Xlsx.renderXlsx(1L)).nonEmpty)
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "xl/workbook.xml"))).isEmpty)
    assert(parse(rebuild(1L)(_.filterNot(_._1 == "xl/sharedStrings.xml"))).isEmpty)
    assert(parse(rebuild(1L)(_.filterNot(_._1.startsWith("xl/worksheets/")))).isEmpty)
    // dangling sheet r:id
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n == "xl/workbook.xml" =>
        (n, new String(d, utf8).replace("r:id=\"rSheet100\"",
          "r:id=\"rSheet999\"").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    // a shared index corrupted past the table
    assert(parse(rebuild(1L)(es => es.map {
      case (n, d, m) if n.startsWith("xl/worksheets/") =>
        (n, new String(d, utf8).replaceFirst("t=\"s\"><v>[0-9]+</v>",
          "t=\"s\"><v>99999</v>").getBytes(utf8), m)
      case e => e
    })).isEmpty)
    assert(parse(Xlsx.renderXlsx(1L).take(75)).isEmpty)
  }

  test("operator: per-cell table, damage quarantines per workbook") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val rows = Xlsx.xlsxExtract(Xlsx.encodeXlsx(docs)).collect()
    val expected = (0L until 24L).map { id =>
      id -> (0 until Xlsx.nSheets(id)).map(s => Xlsx.nRows(id, s) * Xlsx.nCols(id, s)).sum
    }.toMap
    assert(rows.groupBy(_.doc_id).view.mapValues(_.length).toMap == expected)
    val mixed = Xlsx.encodeXlsx(docs.filter($"doc_id" < 2)).as[(Long, Array[Byte])]
      .map { case (id, p) => if (id == 0L) (id, p.take(100)) else (id, p) }
      .toDF("doc_id", "payload")
    assert(Xlsx.xlsxExtract(mixed).collect().map(_.doc_id).distinct.sameElements(Array(1L)))
  }
}
