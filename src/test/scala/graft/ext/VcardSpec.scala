package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class VcardSpec extends AnyFunSuite {

  test("round-trip: split-then-unescape N components, folding, quoted params") {
    for (id <- 0L until 64L) {
      val cards = Vcard.parseVcf(id, Vcard.renderVcf(id))
      assert(cards.length == Vcard.nCards(id), s"vcf $id count")
      cards.foreach { card =>
        val c = card.card_idx.toInt
        assert(card.fn == Vcard.fnOf(id, c), s"vcf $id fn")
        assert(card.family == Vcard.familyOf(id, c), s"vcf $id family")
        assert(card.given == Vcard.givenOf(id, c), s"vcf $id given")
        assert(card.email == Vcard.emailOf(id, c), s"vcf $id email")
        assert(card.org == Vcard.orgOf(id, c), s"vcf $id org")
      }
    }
  }

  test("splitComponents: escaped semicolons stay inside their component") {
    assert(Vcard.splitComponents("Doe\\; jr;Jane;;;") ==
      Vector("Doe\\; jr", "Jane", "", "", ""))
    assert(Vcard.splitComponents("a;b\\\\;c") == Vector("a", "b\\\\", "c"))
  }

  test("damage: nesting, missing N, stray content all quarantine") {
    val good = Vcard.renderVcf(2L)
    assert(Vcard.parseVcfSafe(2L, good).nonEmpty)
    assert(Vcard.parseVcfSafe(2L, good.replaceFirst("N:", "X-N:")).isEmpty)
    assert(Vcard.parseVcfSafe(2L, good.replace("END:VCARD", "X:1")).isEmpty)
    assert(Vcard.parseVcfSafe(2L, "JUNK:1\r\n" + good).isEmpty)
    assert(Vcard.parseVcfSafe(2L, "").isEmpty)
  }

  test("operator: damaged export quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Vcard.encodeVcf(docs).as[(Long, String)].map { case (id, t) =>
      if (id == 6L) (id, t.substring(0, t.length - 12)) else (id, t)
    }.toDF("doc_id", "vcf_text")
    val got = Vcard.vcardContacts(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(6L))
    for (id <- (0L until 24L) if id != 6L)
      assert(byDoc(id).length == Vcard.nCards(id), s"vcf $id")
  }
}
