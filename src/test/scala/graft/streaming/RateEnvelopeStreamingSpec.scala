package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.{PipelineConfig, SarimaxOrder, SeasonalOrder}
import graft.sources.MetricDatagen

/** The reference's rate/backpressure envelope as an executable artifact
  * (SURVEY §6: design ingest 2 msg/s/node x 5 nodes = 10 msg/s; the
  * producer paces itself with sleep(1/rate) — datagen.py:141 — while
  * Structured Streaming's equivalent is the rate source + micro-batch
  * triggers): the fused pipeline must SUSTAIN that load under
  * `Trigger.ProcessingTime` — no backlog growth — while its keyed state
  * stays bounded by node cardinality, not by rows ingested.
  *
  * Built on `rate-micro-batch` (deterministic rows per batch), not the
  * wall-clock `rate` source, so the row counts the assertions divide by
  * are exact. Each micro-batch carries ONE simulated second of design
  * load (10 rows); the trigger runs 10x faster than the simulated clock,
  * so merely keeping up here demonstrates >= 10x the design envelope.
  */
class RateEnvelopeStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("pipeline sustains 10 msg/s design load on rate-micro-batch with node-bounded state") {
    import spark.implicits._
    val numNodes = 5
    val rowsPerBatch = 10 // one simulated second of the reference envelope
    val targetRows = 300L // 30 simulated seconds of load
    val cfg = PipelineConfig(
      maxHistory = 50, minHistory = 4, emitEveryN = 2,
      order = SarimaxOrder(1, 1, 1), seasonalOrder = SeasonalOrder(0, 1, 1, 4),
      windowMillis = 5000L, // 5 simulated seconds per window
      idleFlushMillis = Some(600000L))
    val metrics = MetricDatagen.streamMicroBatch(
      spark, numNodes = numNodes, rowsPerBatch = rowsPerBatch)
    val query = graft.operators.NodePipeline(metrics, cfg)
      .writeStream.format("memory").queryName("rate_envelope_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100L))
      .start()
    try {
      val t0 = System.currentTimeMillis
      def inputRows: Long =
        query.recentProgress.iterator.map(_.numInputRows).sum
      val deadline = t0 + 120000L
      while (System.currentTimeMillis < deadline && inputRows < targetRows) Thread.sleep(150)
      val ingested = inputRows
      val wallSec = (System.currentTimeMillis - t0) / 1000.0
      assert(ingested >= targetRows, s"only $ingested rows ingested in ${wallSec}s")

      // sustained: actual wall-clock throughput must clear the design
      // envelope (it runs ~10-100x above it here; >= 10 msg/s is the
      // reference bar, asserted with real margin for CI noise)
      assert(ingested / wallSec >= 10.0,
        s"below the 10 msg/s design envelope: $ingested rows in ${wallSec}s")

      // bounded state: ONE state row per node (flatMapGroupsWithState keyed
      // by nodeId), regardless of rows ingested — the 100 TB property. A
      // bound that scaled with input would show up as numRowsTotal ~ rows.
      val stateRows = query.recentProgress.iterator
        .flatMap(_.stateOperators.iterator.map(_.numRowsTotal)).toSeq
      assert(stateRows.nonEmpty && stateRows.max <= numNodes,
        s"state rows exceed node cardinality: max=${stateRows.max}")

      // liveness of the windowed output: every node's windows finalize
      val nodes = spark.table("rate_envelope_out")
        .select("nodeId").distinct().as[String].collect().toSet
      assert(nodes.size == numNodes, s"windows missing for nodes: $nodes")

      // no backlog growth: late batches would show as batchDuration
      // consistently above the trigger interval; the median must keep up
      val durs = query.recentProgress.iterator.map(_.batchDuration).toSeq.sorted
      assert(durs.nonEmpty && durs(durs.size / 2) <= 2000L,
        s"median batch duration ${durs(durs.size / 2)}ms cannot sustain the trigger")
    } finally query.stop()
  }
}
