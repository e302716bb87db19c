package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.PipelineConfig
import graft.model.{Alert, Baseline, BaselineOrAggregate, WindowAggregate}
import graft.operators.AlertOp

/** TTL eviction of [[AlertOp]]'s latest-baseline state: an idle key's
  * baseline is dropped after `idleTtlMillis` (its next aggregates are
  * suppressed like a cold start, flinkarima.py:313-316), while a key that
  * keeps receiving rows re-arms its timer and alerts past the original TTL.
  *
  * NOTE: with ProcessingTimeTimeout the query keeps scheduling (possibly
  * empty) micro-batches to honor pending timeouts, so `processAllAvailable`
  * never quiesces — assertions poll the memory sink instead (the
  * NodePipelineStreamingSpec pattern).
  */
class AlertTtlStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val cfg = PipelineConfig() // z_thr=3.0, pct_thr=50.0, min_baseline=1.0

  // baseline 50 with std 5: an observation of 80 is z=6 -> alert
  private def bRow(node: String, t: Long): BaselineOrAggregate =
    BaselineOrAggregate(node, t, isBaseline = true, None,
      Some(Baseline(node, 50.0, 50.0, 100, t, 50.0, 5.0, Some(50.0), Some(50.0))))

  private def aRow(node: String, cpu: Double, t: Long): BaselineOrAggregate =
    BaselineOrAggregate(node, t, isBaseline = false, Some(WindowAggregate(node, cpu, t)), None)

  private def alerts(table: String): Array[Alert] = {
    import spark.implicits._
    spark.table(table).as[Alert].collect()
  }

  private def pollUntil(what: String, timeoutMs: Long = 60000L)(pred: => Boolean): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline && !pred) Thread.sleep(150)
    assert(pred, s"timed out waiting for: $what")
  }

  test("idle key's baseline is evicted after the TTL; an active key's survives") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ttlMs = 1000L
    val input = MemoryStream[BaselineOrAggregate]
    val query = AlertOp(input.toDS(), cfg, idleTtlMillis = Some(ttlMs))
      .writeStream.format("memory").queryName("alert_ttl_out").outputMode("append").start()
    try {
      // both keys get a baseline; node-X immediately proves it is armed
      input.addData(Seq(bRow("node-X", 1000L), bRow("node-Y", 1000L)))
      input.addData(Seq(aRow("node-X", 80.0, 1500L)))
      pollUntil("node-X pre-eviction alert") {
        alerts("alert_ttl_out").exists(a => a.nodeId == "node-X" && a.eventTime == 1500L)
      }

      // node-X now goes idle; node-Y keeps receiving baselines, re-arming
      // its timer each time. Every addData triggers a micro-batch, so
      // node-X's pending timeout (armed >= 3 TTLs before the probe) is
      // guaranteed to have been processed before the probe batch runs.
      val idleFrom = System.currentTimeMillis
      var t = 2000L
      while (System.currentTimeMillis < idleFrom + 3 * ttlMs + 500) {
        input.addData(Seq(bRow("node-Y", t)))
        t += 1000L
        Thread.sleep(250)
      }

      // one probe batch for both keys: Y must alert (state survived well past
      // the original TTL), X must not (state evicted -> cold-start suppression)
      input.addData(Seq(aRow("node-X", 80.0, 999000L), aRow("node-Y", 80.0, 999000L)))
      pollUntil("node-Y post-idle alert") {
        alerts("alert_ttl_out").exists(a => a.nodeId == "node-Y" && a.eventTime == 999000L)
      }
      assert(!alerts("alert_ttl_out").exists(a => a.nodeId == "node-X" && a.eventTime == 999000L),
        "evicted key alerted without a fresh baseline")

      // a fresh baseline re-arms the evicted key like a brand-new one
      input.addData(Seq(bRow("node-X", 999500L)))
      input.addData(Seq(aRow("node-X", 80.0, 999900L)))
      pollUntil("node-X re-armed alert") {
        alerts("alert_ttl_out").exists(a => a.nodeId == "node-X" && a.eventTime == 999900L)
      }
    } finally query.stop()
  }
}
