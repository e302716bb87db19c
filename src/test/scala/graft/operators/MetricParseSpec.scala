package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.Metric

/** JSON parse semantics vs /root/reference/src/flinkarima.py:121-127. */
class MetricParseSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def parse(raws: String*): Seq[Metric] = {
    import spark.implicits._
    MetricParse.parse(raws.toDF("raw")).collect().toSeq
  }

  test("well-formed record parses with all fields") {
    val out = parse("""{"node_id": "node-01", "cpu_utilization": 73.5, "timestamp": 1731883200000}""")
    assert(out == Seq(Metric("node-01", 73.5, 1731883200000L)))
  }

  test("missing timestamp defaults to 0 (flinkarima.py:125)") {
    val out = parse("""{"node_id": "n", "cpu_utilization": 1.5}""")
    assert(out == Seq(Metric("n", 1.5, 0L)))
  }

  test("malformed JSON and missing required fields are dropped (documented divergence §7.5.3)") {
    val out = parse(
      "{oops",
      """{"cpu_utilization": 2.0, "timestamp": 5}""", // no node_id
      """{"node_id": "n", "timestamp": 5}""", // no cpu
      """{"node_id": "ok", "cpu_utilization": 3.0, "timestamp": 7}""")
    assert(out == Seq(Metric("ok", 3.0, 7L)))
  }

  test("serialization emits the reference raw-stream shape (flinkarima.py:444-451)") {
    import spark.implicits._
    val aggs = Seq(("n1", 12.5, 100L)).toDF("nodeId", "cpu", "eventTime")
    val json = MetricParse.toJsonStream(aggs).as[String].head()
    assert(json == """{"node_id":"n1","cpu":12.5,"event_time":100}""")
  }
}
