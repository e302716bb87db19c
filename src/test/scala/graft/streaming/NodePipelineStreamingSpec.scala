package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.{PipelineConfig, SarimaxOrder, SeasonalOrder}
import graft.model.{Metric, PipelineOutput}
import graft.operators.NodePipeline

/** End-to-end Structured Streaming test of the fused pipeline over a
  * MemoryStream: scripted warm-up, baseline cadence, spike alert —
  * FIXTURES.md A5 scenarios against /root/reference/src/flinkarima.py
  * semantics (:218-223 cadence, :313-316 no-baseline suppression,
  * :324-340 alert gates).
  */
class NodePipelineStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("memory-stream pipeline: warm-up, cadence, spike alert across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val cfg = PipelineConfig(
      maxHistory = 50, minHistory = 4, emitEveryN = 2,
      order = SarimaxOrder(1, 1, 1), seasonalOrder = SeasonalOrder(0, 1, 1, 4),
      windowMillis = 1000L)

    val input = MemoryStream[Metric]
    val query = NodePipeline(input.toDS(), cfg)
      .writeStream
      .format("memory")
      .queryName("pipe_out")
      .outputMode("append")
      .start()
    try {
      def sample(i: Int, v: Double) = Metric("node-A", v, (i - 1) * 1000L)

      // batch 1: samples 1..5 (steady 50) -> windows 1..4 finalized
      input.addData((1 to 5).map(sample(_, 50.0)))
      query.processAllAvailable()
      val afterWarmup = spark.table("pipe_out").as[PipelineOutput].collect()
      // cadence: baselines at finalized-window ordinals 2k with history >= 4
      assert(afterWarmup.count(_.kind == "baseline") == 1) // ordinal 4 only
      assert(afterWarmup.count(_.kind == "alert") == 0, "no alert during warm-up (no deviation)")

      // batch 2: samples 6..11 -> windows 5..10 -> baselines at 6, 8, 10
      input.addData((6 to 11).map(sample(_, 50.0)))
      query.processAllAvailable()
      val mid = spark.table("pipe_out").as[PipelineOutput].collect()
      val baselines = mid.filter(_.kind == "baseline").sortBy(_.eventTime)
      assert(baselines.map(_.eventTime).toSeq == Seq(3000L, 5000L, 7000L, 9000L))
      // constant series: baseline forecast equals the level, std 0
      baselines.foreach { b =>
        assert(b.payload.contains(""""baseline_cpu": 50.0"""), b.payload)
        assert(b.payload.contains(""""running_std": 0.0"""), b.payload)
      }
      assert(mid.count(_.kind == "alert") == 0, "steady state must stay quiet")

      // batch 3: spike at sample 12 (window 12), then sample 13 finalizes it
      input.addData(Seq(sample(12, 250.0), sample(13, 50.0)))
      query.processAllAvailable()
      val fin = spark.table("pipe_out").as[PipelineOutput].collect()
      val alerts = fin.filter(_.kind == "alert")
      assert(alerts.length == 1, s"exactly the spike alert: ${alerts.toSeq}")
      val a = alerts.head
      assert(a.eventTime == 11000L)
      // std == 0 -> z forced 0 -> pct gate fires; |z| < 2*thr -> medium
      assert(a.payload.contains(""""severity": "medium""""), a.payload)
      assert(a.payload.contains("pct_deviation=400.00%"), a.payload)
      // spike window's own baseline (#12) emitted AFTER the alert check
      val b12 = fin.filter(_.kind == "baseline").maxBy(_.eventTime)
      assert(b12.eventTime == 11000L)
      assert(b12.payload.contains(""""observed_cpu": 250.0"""), b12.payload)
    } finally query.stop()
  }
}
