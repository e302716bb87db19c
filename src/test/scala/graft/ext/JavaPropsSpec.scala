package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class JavaPropsSpec extends AnyFunSuite {

  private def viaJdk(text: String): Map[String, String] = {
    val p = new java.util.Properties()
    p.load(new java.io.StringReader(text))
    import scala.jdk.CollectionConverters._
    p.asScala.toMap.map { case (k, v) => (k.toString, v.toString) }
  }

  test("JDK differential: every fixture parses key-for-key like java.util.Properties") {
    for (id <- 0L until 128L) {
      val text = JavaProps.renderProps(id)
      val ours = JavaProps.parseProps(id, text).map(e => e.key -> e.value).toMap
      assert(ours == viaJdk(text), s"doc $id differs from the JDK")
    }
  }

  test("JDK differential: adversarial corpus beyond the fixture shapes") {
    val cases = Seq(
      "a=1\\\n  2", // continuation joins with leading-ws strip
      "a=1\\\\\nb=2", // EVEN backslashes: no continuation, b is its own key
      "a\\ b\\=c\\:d = v", // escaped separators in the key
      "key value", // whitespace separator
      "key = ", // empty value
      "key", // bare key, empty value
      "k\t:\tv", // ws + colon + ws separator
      "k \t v2", // ws separator, value starts at v2
      "a=\\b\\c", // lenient escape drop
      "#only a comment\n! another",
      "  # indented comment\nk=v",
      "a=first\na=second\na=third", // last wins
      "dup=x\\\n#not a comment", // continuation line starting with '#': data
      "u=\\u00e9\\u0394", // unicode escapes
      "empty=\ntrail = v  ", // trailing spaces preserved in value
      "eq==v", // '=' then '=v' as value
      "multi=one\\\n\\\n  three") // chained continuations incl. empty line
    cases.zipWithIndex.foreach { case (text, i) =>
      val ours = JavaProps.parseProps(0L, text).map(e => e.key -> e.value).toMap
      assert(ours == viaJdk(text), s"case $i: <$text>")
    }
  }

  test("malformed unicode escape quarantines (the JDK throws on it too)") {
    assertThrows[Exception](viaJdk("a=\\u00g9")) // pin: the JDK rejects it
    assert(JavaProps.parsePropsSafe(0L, "a=\\u00g9").isEmpty)
    assert(JavaProps.parsePropsSafe(0L, "a=\\u00").isEmpty)
    // review arm: fullwidth hex digits — Character.digit accepts them, the
    // JDK loader does NOT; the differential is law
    assertThrows[Exception](viaJdk("a=\\u0\uFF1123"))
    assert(JavaProps.parsePropsSafe(0L, "a=\\u0\uFF1123").isEmpty)
  }

  test("operator: per-document rows with the duplicate-key row resolved (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val got = JavaProps.propEntries(JavaProps.encodeProps(docs)).collect()
    val byDoc = got.groupBy(_.doc_id)
    for (id <- 0L until 24L) {
      assert(byDoc(id).length == JavaProps.nProps(id) + 1, s"doc $id rows")
      assert(byDoc(id).find(_.key == "dup.key").exists(_.value == "second"))
      for (k <- 0 until JavaProps.nProps(id)) {
        val e = byDoc(id).find(_.key == JavaProps.keyOf(id, k)).get
        assert(e.value == JavaProps.valueOf(id, k), s"doc $id key $k")
      }
    }
  }
}
