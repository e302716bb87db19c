package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Metric

/** JSON metric parsing (O3, /root/reference/src/flinkarima.py:121-127) and
  * serialization (O8, :444-451) as built-in Catalyst expressions — no UDF.
  *
  * Input JSON: `{"node_id": "node-42", "cpu_utilization": 73.5, "timestamp": 1731883200000}`
  * Missing `timestamp` defaults to 0 (flinkarima.py:125).
  *
  * Deliberate divergence (SURVEY §7.5.3): malformed records or records missing
  * `node_id`/`cpu_utilization` are dropped (`from_json` yields nulls) instead
  * of killing the task like the reference's bare `json.loads`.
  */
object MetricParse {

  val inputSchema: StructType = StructType(Seq(
    StructField("node_id", StringType),
    StructField("cpu_utilization", DoubleType),
    StructField("timestamp", LongType)))

  /** Parse a DataFrame with a string column `raw` into typed metrics.
    *
    * The parse is fenced ([[graft.functions.Fence.evalOnce]]) so the
    * null-drop filter below cannot be pushed under the projection: without
    * the fence Catalyst re-evaluated the whole from_json chain once per
    * filter conjunct per row inside an interpreted Filter node (from_json
    * blocks whole-stage codegen), tripling the per-row parse cost —
    * optimization guide §4.4's duplicated-UDF shape, JVM edition.
    */
  def parse(raw: DataFrame, rawCol: String = "raw"): Dataset[Metric] = {
    import raw.sparkSession.implicits._
    raw
      .select(graft.functions.Fence.evalOnce(from_json(col(rawCol), inputSchema)).as("m"))
      .select(
        $"m.node_id".as("nodeId"),
        $"m.cpu_utilization".as("cpu"),
        coalesce($"m.timestamp", lit(0L)).as("eventTime"))
      .filter($"nodeId".isNotNull && $"cpu".isNotNull)
      .as[Metric]
  }

  /** Serialize aggregates back to the reference's raw-stream JSON shape
    * `{"node_id":…, "cpu":…, "event_time":…}` (flinkarima.py:444-451).
    */
  def toJsonStream(aggregates: DataFrame): DataFrame =
    aggregates.select(
      to_json(struct(
        col("nodeId").as("node_id"),
        col("cpu"),
        col("eventTime").as("event_time"))).as("value"))
}
