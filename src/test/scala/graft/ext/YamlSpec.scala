package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The subset contract is: WHEREVER [[Yaml.parseYaml]] accepts, SnakeYAML
  * (an independent in-JVM implementation, test classpath only — the
  * java.util.Properties pattern from [[JavaPropsSpec]]) must produce the
  * IDENTICAL flattened tree. Quarantines carry no claim — but the spec
  * pins that every advertised out-of-subset feature actually quarantines.
  */
class YamlSpec extends AnyFunSuite {

  /** SnakeYAML load → flattened (path → normalized value) map, using the
    * same path rules as the parser (dots, numeric sequence segments).
    */
  private def viaSnake(text: String): Map[String, Any] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val out = scala.collection.mutable.Map.empty[String, Any]
    def norm(v: Any): Any = v match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case b: java.lang.Boolean => b.booleanValue()
      case s: String => s
      case other => other
    }
    def walk(node: Any, path: String): Unit = node match {
      case m: java.util.Map[_, _] =>
        m.forEach { (k, v) =>
          walk(v, if (path.isEmpty) k.toString else path + "." + k.toString)
        }
      case l: java.util.List[_] =>
        var i = 0
        l.forEach { v => walk(v, path + "." + i); i += 1 }
      case x => out(path) = norm(x)
    }
    walk(yaml.load[Any](text), "")
    out.toMap
  }

  private def viaOurs(text: String): Map[String, Any] =
    Yaml.parseYaml(0L, text).map { e =>
      e.path -> (e.vtype match {
        case "s" => e.s_val.get
        case "i" => e.i_val.get
        case _ => e.i_val.get == 1L
      })
    }.toMap

  test("SnakeYAML differential: every fixture parses tree-for-tree") {
    for (id <- 0L until 128L) {
      val text = Yaml.renderYaml(id)
      val ours = Yaml.parseYaml(id, text).map { e =>
        e.path -> (e.vtype match {
          case "s" => e.s_val.get
          case "i" => e.i_val.get
          case _ => e.i_val.get == 1L
        })
      }.toMap
      assert(ours == viaSnake(text), s"doc $id differs from SnakeYAML")
      assert(ours.nonEmpty)
    }
  }

  test("SnakeYAML differential: adversarial in-subset corpus beyond the fixture shapes") {
    val cases = Seq(
      "a: 1\nb: hello world\nc: true\nd: false",
      "a: \"x\\ty\\n\\\"q\\\" \\\\ \\u00E9\"", // double-quote escape set
      "a: 'it''s literal \\n here'", // single-quote: backslash survives
      "top:\n  mid:\n    leaf: deep value\n  sib: 2", // nesting + dedent
      "k: v # trailing comment\nl: 3 # another",
      "seq:\n  - one\n  - two\n  - three",
      "seq:\n- one\n- two", // sequence at the parent key's indent
      "objs:\n  - name: a\n    n: 1\n  - name: b\n    n: 2", // compact
      "objs:\n  -\n    name: lone\n    n: 7", // lone-dash item
      "objs:\n  -   name: extra\n      n: 9", // extra spaces after dash
      "a: -7\nb: +12\nc: 0\nd: -0", // signed integers
      "under_scores-and-dashes: ok\n_lead: fine",
      "a: 1\n\n\n# comment gap\nb: 2", // blank/comment interleave
      "s:\n  - \"q s\"\n  - 'l s'\n  - plain s", // quoted seq items
      "m:\n  a: x\nn:\n  - yv", // mapping then same-level key with seq child
      "path: a/b.c-d_e 2.0x") // plain-string charset breadth
    cases.zipWithIndex.foreach { case (text, i) =>
      val ours = viaOurs(text)
      assert(ours == viaSnake(text), s"case $i: <$text>")
      assert(ours.nonEmpty, s"case $i parsed to something")
    }
  }

  test("out-of-subset features quarantine cleanly, never a wrong value") {
    val rejects = Seq(
      "a: &anchor v\nb: *anchor", // anchors/aliases
      "a: !tag v", // tags
      "a: [1, 2]", // flow sequence
      "a: {b: 1}", // flow mapping
      "a: |\n  block", // literal block scalar
      "a: >\n  folded", // folded block scalar
      "--- \na: 1", // document marker
      "%YAML 1.2\na: 1", // directive
      "a: 1\n\tb: 2", // tab indentation
      "a: yes", // 1.1 bool word: resolver disagreement risk
      "a: NO",
      "a: on",
      "a: Off",
      "a: null",
      "a: ~",
      "a: True", // mixed-case bool
      "a: 1.5", // float
      "a: 0x1f", // hex int
      "a: 010", // leading zero (1.1 octal)
      "a: 1_000", // underscore int
      "a: 2026-01-01", // timestamp-shaped
      "a:", // empty value (null)
      "a: 1\na: 2", // duplicate key
      "a: x\n  b: y", // deeper line after an inline value
      "a: x\nb:\n  - - nested", // nested compact sequence
      "'quoted key': v", // non-bare key
      "a: @reserved", // reserved indicator
      "  a: 1", // top level not at column 0
      "a: x: y") // a second ': ' inside a plain scalar
    rejects.zipWithIndex.foreach { case (text, i) =>
      assert(Yaml.parseYamlSafe(0L, text).isEmpty, s"reject case $i: <$text>")
    }
  }

  test("closed-form: fixture rows match the recipe the oracle replays") {
    for (id <- 0L until 48L) {
      val rows = Yaml.parseYaml(id, Yaml.renderYaml(id)).map(e => e.path -> e).toMap
      assert(rows("name").s_val.contains(s"svc-$id"))
      assert(rows("replicas").i_val.contains(Yaml.replicasOf(id)))
      assert(rows("enabled").i_val.contains(if (id % 3 == 0) 1L else 0L))
      assert(rows("version").s_val.contains(Yaml.versionOf(id)))
      assert(rows("motto").s_val.contains(Yaml.mottoOf(id)))
      assert(rows("raw_label").s_val.contains("C:\\new\\dir"))
      assert(rows("limits.cpu_ms").i_val.contains(Yaml.cpuMsOf(id)))
      assert(rows("limits.burst").i_val.contains(Yaml.burstOf(id)))
      assert(rows("limits.tier").s_val.contains(Yaml.tierOf(id)))
      for (k <- 0 until Yaml.nEnv(id))
        assert(rows(s"env.$k").s_val.contains(Yaml.envOf(id, k)), s"doc $id env $k")
      for (j <- 0 until Yaml.nContainers(id)) {
        assert(rows(s"containers.$j.name").s_val.contains(Yaml.containerName(id, j)))
        assert(rows(s"containers.$j.image").s_val.contains(Yaml.containerImage(id, j)))
        assert(rows(s"containers.$j.port").i_val.contains(Yaml.containerPort(id, j)))
      }
      if (id % 5 == 0) {
        assert(rows("volumes.0.kind").s_val.contains("tmp"))
        assert(rows("volumes.0.size_mb").i_val.contains(Yaml.volumeSize(id)))
      }
      val expected = 9 + Yaml.nEnv(id) + 3 * Yaml.nContainers(id) +
        (if (id % 5 == 0) 2 else 0)
      assert(rows.size == expected, s"doc $id row count")
    }
  }

  test("operator: damaged document quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = Yaml.encodeYaml(docs).as[(Long, String)].map { case (id, t) =>
      if (id == 9L) (id, t.replaceFirst("replicas:", "replicas: &a")) else (id, t)
    }.toDF("doc_id", "yaml_text")
    val got = Yaml.yamlEntries(mixed).collect()
    val byDoc = got.groupBy(_.doc_id)
    assert(!byDoc.contains(9L), "anchored document quarantined")
    for (id <- (0L until 24L) if id != 9L)
      assert(byDoc(id).nonEmpty, s"doc $id survives")
  }
}
