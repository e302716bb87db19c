package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators Spark lacks natively, built the way they scale
  * (the brief's custom-operator ladder: compose existing ops where the
  * semantics allow — both of these compose into single-shuffle equi plans,
  * so no custom SparkPlan is warranted).
  *
  *  - [[asof]]: point-in-time enrichment. Spark has no ASOF JOIN; the naive
  *    formulation (non-equi join + per-left-row max) is a
  *    BroadcastNestedLoopJoin followed by a huge aggregation. This is the
  *    sort-based union trick instead: tag both sides, union, one window
  *    pass per key carrying the latest right row forward — a single hash
  *    exchange on the key, linear in |L| + |R|.
  *  - [[rangeJoin]]: interval x point join with NO equi key. Spark's
  *    planner can only produce a nested-loop plan for a bare BETWEEN
  *    condition; bucketing the time axis turns it into an equi-join on the
  *    bucket id (broadcast- or shuffle-hash-joinable) with an exact
  *    BETWEEN post-filter.
  */
object TemporalJoins {

  /** As-of (point-in-time) left join: for every `left` row, attach the
    * single `right` row with the greatest `right.time <= left.time` for the
    * same key (ties at equal time: the right row IS visible), or null if no
    * such row. The right row arrives as one nullable struct column `asofCol`
    * holding every right column except the key.
    *
    * Scale shape: one union (no shuffle), one hash exchange on `key`, one
    * in-partition sort by (time, tag) — right rows sort before left rows at
    * equal time, which is what implements the >= visibility — and a
    * running `last(_, ignoreNulls)` window. Never a nested-loop join; state
    * per key during the sort is O(1).
    *
    * Determinism: callers must ensure at most one right row per (key, time)
    * — with duplicates the carried row is the last in (time, tag) order,
    * which is not further tie-broken.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      asofCol: String = "asof"): DataFrame = {
    val rFields = right.schema.fields.filterNot(_.name == key)
    val rType = StructType(rFields)
    val lNorm = left.select(
      col(key).as("__k"), col(time).cast("long").as("__t"), lit(1).as("__tag"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rNorm = right.select(
      col(key).as("__k"), col(time).cast("long").as("__t"), lit(0).as("__tag"),
      lit(null).cast(left.schema).as("__l"),
      struct(rFields.map(f => col(f.name)): _*).as("__r"))
    val w = Window.partitionBy("__k").orderBy("__t", "__tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .withColumn(asofCol, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__l.*"), col(asofCol))
  }

  /** Keyless interval x point range join: every (interval, point) pair with
    * `start <= point <= end` (closed on both sides), each pair emitted
    * exactly once. Times are non-negative longs (epoch millis/nanos — DIV
    * bucketing truncates toward zero, which equals floor only for
    * non-negative values).
    *
    * `bucketWidth` trades interval replication against per-bucket fan-in:
    * each interval is exploded into (len / bucketWidth + 1) bucket rows,
    * each point hashes to exactly ONE bucket — so the equi-join on the
    * bucket id replaces the nested-loop scan, and a point can never match
    * the same interval through two buckets (no post-dedup needed). Pick
    * bucketWidth near the typical interval length; a hot bucket is
    * intervals-in-bucket x points-in-bucket, the standard blocking
    * tradeoff.
    */
  def rangeJoin(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      pointCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol DIV $bucketWidth"), expr(s"$endCol DIV $bucketWidth"))))
    val pts = points.withColumn("__bucket", expr(s"$pointCol DIV $bucketWidth"))
    iv.join(pts, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
