package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.model.{Metric, WindowAggregate}

/** Keyed tumbling-window AVG/MAX (O4/O5,
  * /root/reference/src/flinkarima.py:261-281, :418-428).
  *
  * The reference uses processing-time tumbling windows; records carry usable
  * epoch-millis event times, so the idiomatic (and strictly better-behaved)
  * Spark port is an event-time window with a zero-lateness watermark
  * (deliberate semantic upgrade, SURVEY §1.4/§7.5.1). The window result keeps
  * the reference's `event_time` semantics: max element event time, falling
  * back to the window end when every element's timestamp was 0
  * (flinkarima.py:267-280).
  *
  * Scale: this is Spark's incremental streaming hash aggregation — partial
  * aggregates in the state store, map-side combine before the shuffle — an
  * improvement over the reference's buffer-all ProcessWindowFunction.
  */
object WindowAgg {

  /** Streaming variant (requires watermark for Append output). */
  def streaming(metrics: Dataset[Metric], windowMillis: Long = 300000L): Dataset[WindowAggregate] =
    agg(metrics, windowMillis, stream = true)

  /** Batch variant (same expressions, no watermark).
    *
    * `exactMean = true` computes the window mean via an exact decimal sum
    * (metric cpus are 2-decimal by the reference's own rounding,
    * datagen.py:76) instead of a double sum — semantically within 1 ulp, but
    * deterministic under ANY partitioning and bit-reproducible by an external
    * oracle engine. Plain double `avg` is partition-order dependent in its
    * last ulp.
    */
  def batch(metrics: Dataset[Metric], windowMillis: Long = 300000L, exactMean: Boolean = false): Dataset[WindowAggregate] =
    agg(metrics, windowMillis, stream = false, exactMean)

  private def agg(metrics: Dataset[Metric], windowMillis: Long, stream: Boolean, exactMean: Boolean = false): Dataset[WindowAggregate] = {
    import metrics.sparkSession.implicits._
    val withTs = metrics.withColumn("ts", timestamp_millis($"eventTime"))
    val marked = if (stream) withTs.withWatermark("ts", "0 seconds") else withTs
    val mean =
      if (exactMean) sum($"cpu".cast("decimal(18,2)")).cast("double") / count(lit(1))
      else avg($"cpu")
    marked
      .groupBy(window($"ts", s"$windowMillis milliseconds"), $"nodeId")
      .agg(mean.as("cpu"), max($"eventTime").as("maxTs"))
      .select(
        $"nodeId",
        $"cpu",
        when($"maxTs" === 0L, unix_millis($"window.end")).otherwise($"maxTs").as("eventTime"))
      .as[WindowAggregate]
  }
}
