package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MarkdownSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def cs(s: String): Long = {
    var c = 0L
    s.getBytes("UTF-8").foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
    c
  }

  private def modelBlocks(id: Long): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    out += (("h1", Markdown.docTitle(id)))
    for (k <- 0 until Markdown.nSections(id)) {
      out += (("h2", Markdown.sectionText(id, k)))
      for (p <- 0 until Markdown.nParas(id, k)) {
        out += (("para", Markdown.paraText(id, k, p)))
        if (k == 0 && p == 0 && Markdown.hasQuote(id))
          out += (("quote", Markdown.quoteText(id)))
      }
      if (k == 1) { out += (("item", Markdown.itemText(id, 0))); out += (("item", Markdown.itemText(id, 1))) }
      if (k == 2) out += (("code", Markdown.codeText(id)))
    }
    out.result()
  }

  test("round-trip: block kinds, order and text recover the model across all arms") {
    for (id <- 0L until 64L) {
      val blocks = Markdown.parseMarkdown(id, Markdown.renderMarkdown(id))
      val expected = modelBlocks(id)
      assert(blocks.length == expected.length, s"doc $id block count")
      blocks.zip(expected).foreach { case (b, (ek, et)) =>
        assert(b.kind == ek, s"doc $id block ${b.block_idx}: ${b.kind} != $ek")
        assert(b.checksum == cs(et) && b.n_chars == et.getBytes("UTF-8").length,
          s"doc $id block ${b.block_idx} ($ek): expected '$et'")
      }
    }
  }

  test("block semantics beyond the fixture: setext vs break, fences, nested inlines") {
    def blocks(md: String): Seq[(String, Long)] =
      Markdown.parseMarkdown(5L, md.getBytes("UTF-8")).map(b => (b.kind, b.checksum))
    // setext needs an OPEN paragraph; standalone dashes are a break
    assert(blocks("Heading\n---\n") == Seq(("h2", cs("Heading"))))
    assert(blocks("Big\n===\n") == Seq(("h1", cs("Big"))))
    assert(blocks("para\n\n---\n\nnext\n") ==
      Seq(("para", cs("para")), ("para", cs("next"))))
    // an unterminated fence runs to EOF (the final newline is content)
    assert(blocks("```\nraw **x**\nstill raw\n") == Seq(("code", cs("raw **x**\nstill raw\n"))))
    // soft wrap joins lines; hard blank splits
    assert(blocks("a\nb\n\nc\n") == Seq(("para", cs("a b")), ("para", cs("c"))))
    // image alt text; nested emphasis in link text; ordered list markers
    assert(blocks("![alt text](u.png) tail\n") == Seq(("para", cs("alt text tail"))))
    assert(blocks("[**bold** link](http://x)\n") == Seq(("para", cs("bold link"))))
    assert(blocks("3. third\n7) seventh\n") ==
      Seq(("item", cs("third")), ("item", cs("seventh"))))
    // entity leniency: bare & stays, numeric decodes
    assert(blocks("AT&T &#233; &unknown; x\n") == Seq(("para", cs("AT&T é &unknown; x"))))
    // intraword underscore survives; boundary underscores strip
    assert(blocks("_em_ snake_case a_b_\n") == Seq(("para", cs("em snake_case a_b"))))
    // code span protects emphasis markers; one-space trim rule
    assert(blocks("`` `lit` `` and ` *raw* `\n") == Seq(("para", cs("`lit` and *raw*"))))
    // review-pass regressions:
    // entities inside code spans stay VERBATIM (decode is scan-local)
    assert(blocks("use `a &amp; b` here &amp; now\n") ==
      Seq(("para", cs("use a &amp; b here & now"))))
    // a trailing # without a preceding space is heading TEXT
    assert(blocks("# C#\n") == Seq(("h1", cs("C#"))))
    assert(blocks("## Title ##\n") == Seq(("h2", cs("Title"))))
    // spaced thematic breaks are breaks, not list items
    assert(blocks("a\n\n- - -\n\n* * *\n\nb\n") ==
      Seq(("para", cs("a")), ("para", cs("b"))))
  }

  test("operator: per-block table over the fixture") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val rows = Markdown.markdownExtract(Markdown.encodeMarkdown(docs)).collect()
    val expected = (0L until 24L).map(id => id -> modelBlocks(id).length).toMap
    assert(rows.groupBy(_.doc_id).view.mapValues(_.length).toMap == expected)
  }
}
