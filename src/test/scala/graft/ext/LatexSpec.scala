package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LatexSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def cs(s: String): Long = {
    var c = 0L
    s.getBytes("UTF-8").foreach(x => c = (c * 31 + (x & 0xff)) % 1000000007L)
    c
  }

  /** The expected (kind, text) block sequence straight off the model. */
  private def modelBlocks(id: Long): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    out += (("title", Latex.docTitle(id)))
    for (k <- 0 until Latex.nSections(id)) {
      out += (("section", Latex.sectionText(id, k)))
      for (p <- 0 until Latex.nParas(id, k)) out += (("para", Latex.paraText(id, k, p)))
      if (k == 1) { out += (("item", Latex.itemText(id, 0))); out += (("item", Latex.itemText(id, 1))) }
      if (k == 2) out += (("verbatim", Latex.verbatimText(id)))
    }
    out.result()
  }

  test("round-trip: block kinds, order and text recover the model across all arms") {
    for (id <- 0L until 64L) {
      val blocks = Latex.parseLatex(id, Latex.renderLatex(id))
      val expected = modelBlocks(id)
      assert(blocks.length == expected.length, s"doc $id block count")
      blocks.zip(expected).foreach { case (b, (ek, et)) =>
        assert(b.kind == ek, s"doc $id block ${b.block_idx} kind")
        assert(b.n_chars == et.getBytes("UTF-8").length && b.checksum == cs(et),
          s"doc $id block ${b.block_idx} ($ek): expected '$et'")
      }
    }
  }

  test("tokenizer semantics beyond the fixture: comments, ligatures, accents, math, discards") {
    def one(tex: String): Seq[(String, Long)] =
      Latex.parseLatex(9L, tex.getBytes("UTF-8")).map(b => (b.kind, b.checksum))
    // the % comment eats the newline AND next-line indentation
    assert(one("frag%x\n   ment\n") == Seq(("para", cs("fragment"))))
    // ligatures longest-match; single quotes pass through
    assert(one("a---b--c `d' ``e''\n") ==
      Seq(("para", cs("a\u2014b\u2013c \u2018d' \u201ce\u201d"))))
    // accents bare and braced; \c cedilla
    assert(one("\\'e \\\"{o} \\c{c}\n") == Seq(("para", cs("é ö ç"))))
    // math verbatim with escaped dollar inside; display form
    assert(one("pre $a_{i} \\$ b$ post\n") == Seq(("para", cs("pre $a_{i} \\$ b$ post"))))
    assert(one("$$\\sum_i x_i$$\n") == Seq(("para", cs("$$\\sum_i x_i$$"))))
    // discard commands eat [opt]{arg}; unknown commands drop + one space
    assert(one("x \\cite[p.~3]{smith} y \\textsc z\n") == Seq(("para", cs("x y z"))))
    // transparent groups: emph/textbf contribute only their content
    assert(one("\\emph{\\textbf{deep}} flat\n") == Seq(("para", cs("deep flat"))))
    // \\\\ is a line break inside a block
    assert(one("up\\\\down\n") == Seq(("para", cs("up\ndown"))))
    // figure skipped whole including its caption
    assert(one("a\n\n\\begin{figure}\\caption{gone}\\end{figure}\n\nb\n") ==
      Seq(("para", cs("a")), ("para", cs("b"))))
    // verbatim: % and \\ inert
    assert(one("\\begin{verbatim}\nkeep % all \\of it\n\\end{verbatim}\n") ==
      Seq(("verbatim", cs("keep % all \\of it"))))
  }

  test("malformed sources quarantine: braces, math, environments, accents") {
    def bad(tex: String): Unit =
      intercept[RuntimeException](Latex.parseLatex(1L, tex.getBytes("UTF-8")))
    bad("unbalanced {group\n")
    bad("closing } too many\n")
    bad("unterminated $math\n")
    bad("\\begin{verbatim} never ends\n")
    bad("\\begin{figure} never ends\n")
    bad("\\section no brace follows\n")
    bad("bad accent \\'9\n")
    bad("\\q{") // unknown command then an unclosed group
  }

  test("operator: per-block table, damage quarantines per document") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val rows = Latex.latexExtract(Latex.encodeLatex(docs)).collect()
    val expected = (0L until 24L).map(id => id -> modelBlocks(id).length).toMap
    assert(rows.groupBy(_.doc_id).view.mapValues(_.length).toMap == expected)
    val mixed = Latex.encodeLatex(docs.filter($"doc_id" < 2)).as[(Long, Array[Byte])]
      .map { case (id, p) =>
        // a stray close brace up front (damage after \end{document} would
        // legitimately be ignored — the parser stops there)
        if (id == 0L) (id, ("}" + new String(p, "UTF-8")).getBytes("UTF-8")) else (id, p)
      }
      .toDF("doc_id", "payload")
    assert(Latex.latexExtract(mixed).collect().map(_.doc_id).distinct.sameElements(Array(1L)))
  }
}
