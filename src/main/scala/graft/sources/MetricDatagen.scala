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

  /** md5-derived uniform [0,1): the SQL-replayable twin of [[u01]] (the
    * simhash_md5_pairs playbook). Both engines compute the identical md5
    * hex of "seed:role:k", so the first 15 hex chars (60 bits, safely
    * inside a positive long) give the same integer, the same modulus, and
    * the same IEEE division — the value model becomes bitwise
    * oracle-checkable. Costs ~an md5 per draw vs xxhash64's few ns: the
    * GATE twin, not the production path.
    */
  private def u01Md5(seed: Long, role: String, k: Column): Column =
    (conv(substring(md5(concat_ws(":", lit(seed), lit(role), k.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 1000000L).cast("double") / 1000000.0

  private def nodeIdCol(i: Column): Column = format_string("node-%02d", i + 1)

  /** The value model before presentation rounding, parameterized by the
    * uniform source so the engine-hash path ([[u01]]) and the portable
    * gate twin ([[u01Md5]]) share every arithmetic step: per-node base,
    * hour-of-day seasonality, optional minute factor, noise, 1% spikes,
    * clamp to [0,100]. Returned UNROUNDED: round(2) is presentation (the
    * reference's output format), and Spark round (BigDecimal HALF_UP) vs
    * DuckDB round (FP multiply) diverge on near-midpoint doubles — the
    * qTextQuality rationale — so the bitwise gate sits on the raw model.
    */
  private def cpuModel(
      u: (String, Column) => Column,
      nodeIdx: Column,
      eventTimeMs: Column,
      rowKey: Column,
      minuteFactor: Boolean): Column = {
    val ts = timestamp_millis(eventTimeMs)
    val hr = hour(ts)
    val base = lit(30.0) + u("base", nodeIdx) * 40.0
    val hourFactor = when(hr < 6, 0.4)
      .when(hr < 9, 0.6)
      .when(hr < 17, 1.2)
      .when(hr < 22, 0.8)
      .otherwise(0.5)
    val minFactor =
      if (minuteFactor) lit(1.0) + (minute(ts) % 15).cast("double") * 0.02 else lit(1.0)
    val noise = u("noise", rowKey) * 10.0 - 5.0
    val spike = when(u("spikep", rowKey) < 0.01, lit(30.0) + u("spikev", rowKey) * 20.0)
      .otherwise(0.0)
    val cpu = base * hourFactor * minFactor + noise + spike
    greatest(lit(0.0), least(lit(100.0), cpu))
  }

  /** The value model, given node index and epoch-millis event time columns. */
  def cpuExpr(nodeIdx: Column, eventTimeMs: Column, rowKey: Column, seed: Long, minuteFactor: Boolean): Column =
    round(cpuModel(u01(seed, _, _), nodeIdx, eventTimeMs, rowKey, minuteFactor), 2)

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

  /** The md5-portable gate twin of [[batch]]: the IDENTICAL row scaffold
    * and value model, with every uniform drawn from [[u01Md5]] instead of
    * xxhash64, and the cpu emitted UNROUNDED as `cpu_model` (see
    * [[cpuModel]]). This puts the whole generator machinery — node
    * assignment, cadence, seasonality, noise, spike, clamp — under a
    * bitwise DuckDB oracle; the xxhash64 path stays the production-speed
    * configuration and is gated rows-only.
    */
  def batchPortableModel(
      spark: SparkSession,
      numNodes: Int = 5,
      samplesPerNode: Int = 1000,
      startEpochMs: Long = 1704067200000L,
      intervalMs: Long = 500L,
      seed: Long = 42L,
      minuteFactor: Boolean = false): DataFrame = {
    val n = numNodes.toLong * samplesPerNode
    spark
      .range(0L, n, 1L, spark.sparkContext.defaultParallelism)
      .select(
        (col("id") % numNodes).as("nodeIdx"),
        (lit(startEpochMs) + expr(s"id DIV $numNodes") * intervalMs).as("eventTime"),
        col("id").as("rowKey"))
      .select(
        nodeIdCol(col("nodeIdx")).as("node_id"),
        cpuModel(u01Md5(seed, _, _), col("nodeIdx"), col("eventTime"), col("rowKey"), minuteFactor)
          .as("cpu_model"),
        col("eventTime").as("event_time"))
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
