package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.{PipelineConfig, SarimaxOrder, SeasonalOrder}
import graft.model.{Baseline, WindowAggregate}

/** The transformWithState baseline (RocksDB state store, per-field state)
  * must emit EXACTLY what the flatMapGroupsWithState form emits — both
  * delegate to BaselineOp.step, so any divergence is a state-plumbing bug.
  */
class BaselineProcessorSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("transformWithState over RocksDB matches the flatMapGroupsWithState baseline") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val cfg = PipelineConfig(
      maxHistory = 20, minHistory = 4, emitEveryN = 2,
      order = SarimaxOrder(1, 1, 1), seasonalOrder = SeasonalOrder(0, 1, 1, 4))

    val rng = new scala.util.Random(23)
    def series(node: String) =
      (1 to 15).map(i => WindowAggregate(node, 40.0 + rng.nextInt(2000) / 100.0, i * 1000L))
    val batch1 = series("n1").take(8) ++ series("n2").take(5)
    val batch2 = series("n1").drop(8).map(a => a.copy(eventTime = a.eventTime + 8000L)) ++
      series("n2").drop(5).map(a => a.copy(eventTime = a.eventTime + 5000L))

    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    val input = MemoryStream[WindowAggregate]
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val query = BaselineProcessor(input.toDS(), cfg)
      .writeStream.format("memory").queryName("tws_out").outputMode("append").start()
    try {
      input.addData(batch1)
      query.processAllAvailable()
      input.addData(batch2)
      query.processAllAvailable()
      val got = spark.table("tws_out").as[Baseline].collect().sortBy(b => (b.nodeId, b.eventTime))

      // reference: the flatMapGroupsWithState operator replayed in batch
      // over the same rows (same per-key event-time order)
      val expected = BaselineOp((batch1 ++ batch2).toDS(), cfg)
        .collect().sortBy(b => (b.nodeId, b.eventTime))

      assert(got.nonEmpty, "cadence should have produced baselines")
      assert(got.toSeq == expected.toSeq)
    } finally {
      query.stop()
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }
}
