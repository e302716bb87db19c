package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Metric

/** Synthetic node-CPU metric generator (O2/O15,
  * /root/reference/src/flinkarima.py:45-118 and
  * /root/reference/src/datagen.py:25-76).
  *
  * Reproduces the reference's value model: per-node base level in U(30,70),
  * hour-of-day factor {0-6h: 0.4, 6-9h: 0.6, 9-17h: 1.2, 17-22h: 0.8,
  * else 0.5}, optional minute factor `1 + (minute % 15) * 0.02`
  * (datagen.py:58, external generator only), noise U(-5,5), 1% spikes of
  * U(+30,+50), clamp to [0,100], round(2).
  *
  * Instead of `random.uniform`, randomness is derived from `xxhash64(seed,
  * role, key)` — a pure column expression, so the output is deterministic
  * under ANY partitioning/parallelism (Spark's `rand(seed)` is only
  * deterministic per partition layout), retryable on task failure, and fully
  * codegen'd. That is the property a 100 TB backfill of synthetic data needs.
  */
object MetricDatagen {

  /** uniform [0,1) from a hash of (seed, role, k) */
  private def u01(seed: Long, role: String, k: Column): Column =
    (pmod(xxhash64(lit(seed), lit(role), k), lit(1000000L)).cast("double") / 1000000.0)

  private def nodeIdCol(i: Column): Column = format_string("node-%02d", i + 1)

  /** The value model, given node index and epoch-millis event time columns. */
  def cpuExpr(nodeIdx: Column, eventTimeMs: Column, rowKey: Column, seed: Long, minuteFactor: Boolean): Column = {
    val ts = timestamp_millis(eventTimeMs)
    val hr = hour(ts)
    val base = lit(30.0) + u01(seed, "base", nodeIdx) * 40.0
    val hourFactor = when(hr < 6, 0.4)
      .when(hr < 9, 0.6)
      .when(hr < 17, 1.2)
      .when(hr < 22, 0.8)
      .otherwise(0.5)
    val minFactor =
      if (minuteFactor) lit(1.0) + (minute(ts) % 15).cast("double") * 0.02 else lit(1.0)
    val noise = u01(seed, "noise", rowKey) * 10.0 - 5.0
    val spike = when(u01(seed, "spikep", rowKey) < 0.01, lit(30.0) + u01(seed, "spikev", rowKey) * 20.0)
      .otherwise(0.0)
    val cpu = base * hourFactor * minFactor + noise + spike
    round(greatest(lit(0.0), least(lit(100.0), cpu)), 2)
  }

  /** Batch generation: `samplesPerNode` rows per node at a fixed cadence.
    * Used for backfills and as the deterministic test fixture.
    */
  def batch(
      spark: SparkSession,
      numNodes: Int = 5,
      samplesPerNode: Int = 1000,
      startEpochMs: Long = 1704067200000L, // 2024-01-01 00:00 UTC
      intervalMs: Long = 500L, // 2 msg/s/node, the reference default rate
      seed: Long = 42L,
      minuteFactor: Boolean = false): Dataset[Metric] = {
    import spark.implicits._
    val n = numNodes.toLong * samplesPerNode
    spark
      .range(0L, n, 1L, spark.sparkContext.defaultParallelism)
      .select(
        (col("id") % numNodes).as("nodeIdx"),
        // integer DIV: `/` on longs is double division, which both mistypes
        // eventTime and loses precision for large ids
        (lit(startEpochMs) + expr(s"id DIV $numNodes") * intervalMs).as("eventTime"),
        col("id").as("rowKey"))
      .select(
        nodeIdCol(col("nodeIdx")).as("nodeId"),
        cpuExpr(col("nodeIdx"), col("eventTime"), col("rowKey"), seed, minuteFactor).as("cpu"),
        col("eventTime"))
      .as[Metric]
  }

  /** Streaming generation on the built-in rate source: `rate` msgs/s/node
    * across `numNodes` nodes (flinkarima.py:51: rate is per node).
    */
  def stream(
      spark: SparkSession,
      numNodes: Int = 5,
      rate: Double = 2.0,
      seed: Long = 42L,
      minuteFactor: Boolean = false): Dataset[Metric] = {
    val rows = spark.readStream
      .format("rate")
      .option("rowsPerSecond", math.max(1L, (numNodes * rate).toLong))
      .load() // schema: (timestamp TIMESTAMP, value LONG)
    metricsFromRateRows(rows, numNodes, seed, minuteFactor)
  }

  /** Shared tail of both rate-source forms: (timestamp, value) rows ->
    * seasonal [[Metric]]s, value driving node assignment and the
    * hash-derived randomness.
    */
  private def metricsFromRateRows(
      rows: DataFrame, numNodes: Int, seed: Long, minuteFactor: Boolean): Dataset[Metric] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(
        (col("value") % numNodes).as("nodeIdx"),
        unix_millis(col("timestamp")).as("eventTime"),
        col("value").as("rowKey"))
      .select(
        nodeIdCol(col("nodeIdx")).as("nodeId"),
        cpuExpr(col("nodeIdx"), col("eventTime"), col("rowKey"), seed, minuteFactor).as("cpu"),
        col("eventTime"))
      .as[Metric]
  }

  /** Deterministic micro-batch streaming generation (`rate-micro-batch`
    * source): exactly `rowsPerBatch` rows per micro-batch with event time
    * advancing `advanceMsPerBatch` per batch — the reproducible form of
    * [[stream]] (the wall-clock `rate` source cannot promise per-batch row
    * counts, so throughput/state assertions built on it flake). Defaults
    * reproduce the reference design envelope: 10 rows per 1 s batch =
    * 2 msg/s/node x 5 nodes (flinkarima.py:51,496; datagen.py:169). The
    * value column drives both node assignment and the hash-derived
    * seasonality, so the emitted metrics are identical run to run.
    */
  def streamMicroBatch(
      spark: SparkSession,
      numNodes: Int = 5,
      rowsPerBatch: Int = 10,
      advanceMsPerBatch: Long = 1000L,
      startEpochMs: Long = 1704067200000L,
      seed: Long = 42L,
      minuteFactor: Boolean = false): Dataset[Metric] = {
    val rows = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toLong)
      .option("advanceMillisPerBatch", advanceMsPerBatch)
      .option("startTimestamp", startEpochMs)
      .load() // schema: (timestamp TIMESTAMP, value LONG)
    metricsFromRateRows(rows, numNodes, seed, minuteFactor)
  }

  /** The external datagen's Kafka-facing JSON shape (datagen.py:129-134). */
  def asKafkaJson(metrics: Dataset[Metric]): DataFrame =
    metrics.select(
      to_json(struct(
        col("nodeId").as("node_id"),
        col("cpu").as("cpu_utilization"),
        col("eventTime").as("timestamp"))).as("value"))
}
