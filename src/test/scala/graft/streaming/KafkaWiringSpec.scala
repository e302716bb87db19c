package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.PipelineConfig

/** O1 wiring, asserted without a broker: this sandbox ships neither a Kafka
  * broker nor the spark-sql-kafka connector jar, so the reader itself is
  * untestable here (README documents the integration gap). What IS pinned:
  * the consumer options map matches the reference consumer config
  * (/root/reference/src/flinkarima.py:379-389), and source construction
  * fails fast with the connector-missing error rather than something
  * subtler. If the connector IS on the classpath (a real deployment), the
  * same test asserts the parsed stream's schema instead.
  */
class KafkaWiringSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("kafka reader options mirror the reference consumer config") {
    val cfg = PipelineConfig(topic = "node-metrics-x", bootstrapServers = "broker-7:9092")
    val opts = SarimaxBaselineJob.kafkaOptions(cfg)
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "broker-7:9092", // flinkarima.py:381
      "subscribe" -> "node-metrics-x",              // flinkarima.py:380
      "startingOffsets" -> "latest"))               // flinkarima.py:385 (latest offsets)
  }

  test("kafka source builds a correctly-typed stream, or fails fast without the connector") {
    val cfg = PipelineConfig()
    try {
      val ds = SarimaxBaselineJob.kafkaMetrics(spark, cfg)
      // connector present: the parsed stream must already have the Metric shape
      assert(ds.isStreaming)
      assert(ds.schema.fieldNames.toSeq == Seq("nodeId", "cpu", "eventTime"))
    } catch {
      case e: Exception =>
        val msg = Option(e.getMessage).getOrElse("")
        assert(msg.toLowerCase.contains("kafka"),
          s"expected the connector-missing error, got: $msg")
    }
  }
}
