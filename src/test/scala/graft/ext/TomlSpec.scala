package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class TomlSpec extends AnyFunSuite {

  private def entriesOf(id: Long): Map[(String, Long), (String, Option[String], Option[Long])] =
    Toml.parseToml(id, Toml.renderToml(id))
      .map(e => (e.key, e.arr_idx) -> ((e.vtype, e.s_val, e.i_val))).toMap

  test("round-trip: tables, dotted keys, both string forms, ints, bools, arrays") {
    for (id <- 0L until 64L) {
      val m = entriesOf(id)
      assert(m(("package.name", 0L)) == (("s", Some(s"pkg-$id"), None)), s"doc $id name")
      assert(m(("package.description", 0L)) ==
        (("s", Some(Toml.pkgDescription(id)), None)), s"doc $id description")
      // literal semantics: the backslash-n survives as two characters
      assert(m(("package.raw-path", 0L)) == (("s", Some("C:\\new\\dir"), None)))
      assert(m(("package.edition", 0L)) == (("i", None, Some(2021L))))
      assert(m(("package.build-count", 0L)) == (("i", None, Some(Toml.buildCount(id)))),
        s"doc $id build-count")
      assert(m(("package.publish", 0L)) == (("b", None, Some(if (id % 3 == 0) 1L else 0L))))
      val feats = Toml.featureWords(id)
      feats.zipWithIndex.foreach { case (wd, j) =>
        assert(m(("package.features", j.toLong)) == (("s", Some(wd), None)), s"doc $id feat $j")
      }
      for (k <- 0 until Toml.nDeps(id))
        assert(m((s"dependencies.${Toml.depName(id, k)}", 0L)) ==
          (("s", Some(Toml.depVersion(id, k)), None)), s"doc $id dep $k")
      assert(m(("profile.release.debug", 0L)) == (("b", None, Some(0L))))
      assert(m(("profile.release.opt-level", 0L)) == (("i", None, Some(3L))))
      assert(m(("meta.owner.team", 0L)) == (("s", Some("graft"), None)))
    }
  }

  test("grammar gates: escapes, separators, duplicates, out-of-subset forms") {
    def parse(t: String) = Toml.parseToml(0L, t)
    // unknown escape is damage
    assert(Toml.parseTomlSafe(0L, "a = \"x\\qy\"").isEmpty)
    // underscore placement
    assert(parse("a = 1_234")(0).i_val.contains(1234L))
    assert(Toml.parseTomlSafe(0L, "a = _1").isEmpty)
    assert(Toml.parseTomlSafe(0L, "a = 1_").isEmpty)
    assert(Toml.parseTomlSafe(0L, "a = 1__2").isEmpty)
    // floats and dates are a clean quarantine, never a wrong value
    assert(Toml.parseTomlSafe(0L, "a = 1.5").isEmpty)
    assert(Toml.parseTomlSafe(0L, "a = 1979-05-27").isEmpty)
    // duplicate keys are damage per spec
    assert(Toml.parseTomlSafe(0L, "a = 1\na = 2").isEmpty)
    assert(Toml.parseTomlSafe(0L, "[t]\na = 1\n[t2]\na = 2").nonEmpty) // distinct paths
    // arrays of tables / inline tables / nested arrays out of subset
    assert(Toml.parseTomlSafe(0L, "[[t]]\na = 1").isEmpty)
    assert(Toml.parseTomlSafe(0L, "a = [[1]]").isEmpty)
    assert(Toml.parseTomlSafe(0L, "a = {b = 1}").isEmpty)
    // comments + trailing comma + whitespace tolerance
    val ok = parse("# c\n  a.b = [ 1, 2, ] # tail\n")
    assert(ok.map(e => (e.arr_idx, e.i_val.get)) == Seq((0L, 1L), (1L, 2L)))
    // unterminated strings
    assert(Toml.parseTomlSafe(0L, "a = \"x").isEmpty)
    assert(Toml.parseTomlSafe(0L, "a = 'x").isEmpty)
    // review arms: Unicode-lenient digits, leading zeros, control chars
    assert(Toml.parseTomlSafe(0L, "a = １２３").isEmpty) // fullwidth digits
    assert(Toml.parseTomlSafe(0L, "a = \"x\\u0１23\"").isEmpty) // fullwidth hex in \\u
    assert(Toml.parseTomlSafe(0L, "a = 007").isEmpty)
    assert(Toml.parseTomlSafe(0L, "a = -007").isEmpty)
    assert(parse("a = 0")(0).i_val.contains(0L)) // bare zero stays legal
    assert(Toml.parseTomlSafe(0L, "a = \"x\u0001y\"").isEmpty) // raw control char
    assert(Toml.parseTomlSafe(0L, "a = 'x\u0001y'").isEmpty)
    assert(parse("a = \"x\ty\"")(0).s_val.contains("x\ty")) // raw TAB stays legal
  }

  test("operator: damaged manifest quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Toml.encodeToml(docs).as[(Long, String)].map { case (id, t) =>
      if (id == 8L) (id, t.replace("edition = 2021", "edition = 20.21")) else (id, t)
    }.toDF("doc_id", "toml_text")
    val got = Toml.tomlEntries(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(8L))
    assert(byDoc.size == 23)
  }
}
