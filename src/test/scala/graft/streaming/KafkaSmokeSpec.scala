package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.PipelineConfig

/** GATED end-to-end smoke of the reference dataflow's one untested seam
  * (O1): Kafka source -> JSON parse -> event-time window aggregate -> sink.
  *
  * The sandbox ships neither a broker nor the spark-sql-kafka connector, so
  * without `SPARK_KAFKA_BOOTSTRAP` this test is CANCELLED (skipped-green,
  * visible in the report), not failed — KafkaWiringSpec still pins the
  * consumer options and the parse path unconditionally. Against a real
  * deployment, run e.g.:
  *
  *   SPARK_KAFKA_BOOTSTRAP=broker:9092 sbt "testOnly graft.streaming.KafkaSmokeSpec"
  *
  * (optionally SPARK_KAFKA_TOPIC; a unique throwaway topic is used
  * otherwise). The test produces through the SAME connector it reads with,
  * so one env var exercises the full round trip.
  */
class KafkaSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("kafka round trip: source -> parse -> window -> sink (needs SPARK_KAFKA_BOOTSTRAP)") {
    val bootstrap = sys.env.get("SPARK_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined,
      "SPARK_KAFKA_BOOTSTRAP not set — no broker in this environment")
    val servers = bootstrap.get
    val topic = sys.env.getOrElse("SPARK_KAFKA_TOPIC",
      "graft-smoke-" + java.util.UUID.randomUUID().toString.take(8))
    import spark.implicits._

    val cfg = PipelineConfig(topic = topic, bootstrapServers = servers)
    // the reference dataflow head: consumer config via kafkaOptions
    // (flinkarima.py:379-389), value -> MetricParse (O3), then the 5-min
    // window shape at 1s scale so the smoke completes quickly (O4/O5)
    val windowed = SarimaxBaselineJob.kafkaMetrics(spark, cfg)
      .withColumn("ts", timestamp_millis(col("eventTime")))
      .groupBy(window(col("ts"), "1 second"), col("nodeId"))
      .agg(avg("cpu").as("avg_cpu"), count(lit(1)).as("n"))
    val query = windowed.writeStream
      .format("memory").queryName("kafka_smoke_out").outputMode("complete").start()
    try {
      // the reader subscribes at LATEST offsets (reference semantics), so
      // produce after the query starts and re-produce until a window lands —
      // robust to the subscribe/produce race without weakening the offsets
      // contract under test
      val payload = (1 to 20).map { i =>
        s"""{"node_id": "smoke-1", "cpu_utilization": ${40 + i}.0, "timestamp": ${i * 250L}}"""
      }
      val deadline = System.currentTimeMillis + 90000L
      var rows = 0L
      while (System.currentTimeMillis < deadline && rows == 0L) {
        payload.toDF("value").write.format("kafka")
          .option("kafka.bootstrap.servers", servers)
          .option("topic", topic)
          .save()
        Thread.sleep(1000L)
        rows = spark.table("kafka_smoke_out").count()
      }
      assert(rows > 0, "no windowed rows arrived from the kafka round trip")
      val nodes = spark.table("kafka_smoke_out").select("nodeId").distinct().as[String].collect()
      assert(nodes.contains("smoke-1"), s"unexpected node ids: ${nodes.toSeq}")
    } finally query.stop()
  }
}
