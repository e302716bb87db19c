package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.core.PipelineConfig
import graft.model.{Baseline, NodeState, WindowAggregate}

/** The SARIMAX baseline operator on Spark 4's `transformWithState` API — the
  * production-scale form (SURVEY §7.4.5): per-field state columns instead of
  * one monolithic case-class blob, designed for the RocksDB state store
  * provider where key cardinality is the scale axis.
  *
  * The state layout mirrors the reference's Flink descriptors one-to-one
  * (/root/reference/src/flinkarima.py:171-189): `history` and `rawHistory`
  * as ListState[Double], the emit counter and Welford accumulators as a
  * ValueState — the same mapping SURVEY §1.3 tabulates. Per-element
  * semantics are IDENTICAL to [[BaselineOp]]: both delegate to
  * [[BaselineOp.step]].
  */
object BaselineProcessor {

  /** Welford + emit-gate scalars ("emit_counter", "sample_count",
    * "running_mean", "running_m2" in the reference).
    */
  final case class Meta(emitCounter: Int, count: Long, mean: Double, m2: Double)

  final class Processor(cfg: PipelineConfig)
      extends StatefulProcessor[String, WindowAggregate, Baseline] {

    @transient private var history: ListState[Double] = _
    @transient private var rawHistory: ListState[Double] = _
    @transient private var meta: ValueState[Meta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      history = getHandle.getListState[Double]("history", Encoders.scalaDouble, TTLConfig.NONE)
      rawHistory = getHandle.getListState[Double]("rawHistory", Encoders.scalaDouble, TTLConfig.NONE)
      meta = getHandle.getValueState[Meta]("meta", Encoders.product[Meta], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        inputRows: Iterator[WindowAggregate],
        timerValues: TimerValues): Iterator[Baseline] = {
      val m = Option(meta.get()).getOrElse(Meta(0, 0L, 0.0, 0.0))
      var st = NodeState(
        history = iterToVector(history.get()),
        rawHistory = iterToVector(rawHistory.get()),
        emitCounter = m.emitCounter,
        count = m.count,
        mean = m.mean,
        m2 = m.m2)
      val out = ArrayBuffer.empty[Baseline]
      inputRows.toArray.sortBy(_.eventTime).foreach { aggRow =>
        val (next, emitted) = BaselineOp.step(cfg, st, aggRow)
        st = next
        emitted.foreach(out += _)
      }
      history.put(st.history.toArray)
      rawHistory.put(st.rawHistory.toArray)
      meta.update(Meta(st.emitCounter, st.count, st.mean, st.m2))
      out.iterator
    }

    private def iterToVector(it: Iterator[Double]): Vector[Double] = {
      val b = Vector.newBuilder[Double]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  /** `transformWithState` wiring; requires the RocksDB state store provider
    * in streaming mode
    * (`spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`).
    */
  def apply(aggregates: Dataset[WindowAggregate], cfg: PipelineConfig): Dataset[Baseline] = {
    import aggregates.sparkSession.implicits._
    aggregates
      .groupByKey(_.nodeId)
      .transformWithState(new Processor(cfg), TimeMode.None(), OutputMode.Append())
  }
}
