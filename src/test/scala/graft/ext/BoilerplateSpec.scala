package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def blocks(html: String): Seq[Boilerplate.Block] =
    Boilerplate.blocksOf(7L, html)

  test("segmentation: block tags flush, inline tags do not, empty runs vanish") {
    val b = blocks("<p>one two three four five six seven</p>\n" +
      "<div>eight <span>nine</span> ten eleven twelve thirteen</div>")
    assert(b.length == 2)
    assert(b(0).block_id == 0 && b(1).block_id == 1)
    assert(b(0).n_chars == "one two three four five six seven".length)
    assert(b(1).n_chars == "eight nine ten eleven twelve thirteen".length)
    // <br> and <b> are inline: one block
    assert(blocks("<p>aaaa bbbb<br/>cccc <b>dddd</b> eeee ffff gggg</p>").length == 1)
  }

  test("label rules: semantic tag, link density, length floor, content") {
    val long = "word " * 8 // 40 chars, trims to 39
    val nav = blocks(s"<nav><p>$long</p></nav>")
    assert(nav.head.label == "boilerplate", "semantic rule")
    val linky = blocks("<div><a href=\"/\">aaaaaaaaaaaaaaaaaaaa</a> bb cc dd</div>")
    assert(linky.head.label == "boilerplate" && linky.head.n_link_chars == 20, "link rule")
    val short = blocks("<p>tiny text</p>")
    assert(short.head.label == "boilerplate", "length floor")
    val good = blocks(s"<p>$long</p>")
    assert(good.head.label == "content" && good.head.n_chars == 39)
    // inline link below half density stays content
    val inline = blocks(s"<p>${long}<a href=\"/x\">link</a> $long</p>")
    assert(inline.head.label == "content" && inline.head.n_link_chars == 4)
  }

  test("semantic nesting: close restores; text after </nav> is clean") {
    val b = blocks("<nav><p>menu items here and more</p></nav>" +
      "<p>real body content with enough length to pass the floor</p>")
    assert(b.map(_.label) == Seq("boilerplate", "content"))
    // nested semantic regions: inner close must not unwind the outer
    val n2 = blocks("<footer><nav><li>a b c d e f g h i j k l m n</li></nav>" +
      "<p>still in the footer with plenty of length here</p></footer>")
    assert(n2.map(_.label) == Seq("boilerplate", "boilerplate"))
  }

  test("hazards: script/comment decoys, quoted '>', entities, whitespace collapse") {
    val b = blocks("<p><script>var a=\"<p>fake</p> <a href='x'>z</a>\";</script>" +
      "real   content\t\nwith  collapsed     whitespace everywhere</p>")
    assert(b.length == 1)
    assert(b.head.n_chars == "real content with collapsed whitespace everywhere".length)
    val c = blocks("<p><!-- <a href=\"/decoy\">fake</a> -->visible content of real length here</p>")
    assert(c.length == 1 && c.head.n_link_chars == 0)
    val q = blocks("<div class=\"a>b\">attribute with quoted gt sign stays markup</div>")
    assert(q.length == 1 && q.head.n_chars == "attribute with quoted gt sign stays markup".length)
    val e = blocks("<p>A&amp;B and C&#68; and D&nbsp;E plus padding to pass floor</p>")
    assert(e.head.n_chars == "A&B and CD and D E plus padding to pass floor".length)
  }

  test("fixture end-to-end: every label arm occurs, ids dense, partition-stable") {
    import spark.implicits._
    val docs = (0L until 300L).toDF("doc_id")
    val out = Boilerplate.contentBlocks(Boilerplate.encodePages(docs)).collect()
    val byDoc = out.groupBy(_.doc_id)
    assert(byDoc.size == 300)
    byDoc.foreach { case (id, bs) =>
      assert(bs.map(_.block_id).sorted.toSeq == (0L until bs.length).toSeq, s"doc $id dense ids")
      val np = 2 + Integer.parseInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s"bp:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(3, 4), 16) % 3
      val content = bs.filter(_.label == "content")
      assert(content.length == np, s"doc $id: exactly the paragraphs are content")
      assert(bs.head.label == "boilerplate" && bs.last.label == "boilerplate")
    }
    assert(out.exists(b => b.label == "boilerplate" && b.n_link_chars > 0 && b.n_chars < 2 * b.n_link_chars + 9))
    assert(out.exists(b => b.label == "content" && b.n_link_chars > 0), "inline-link paragraph occurs")
    val again = Boilerplate.contentBlocks(Boilerplate.encodePages(docs.repartition(13))).collect()
    assert(again.map(b => (b.doc_id, b.block_id, b.checksum)).sorted.toSeq ==
      out.map(b => (b.doc_id, b.block_id, b.checksum)).sorted.toSeq)
  }
}
