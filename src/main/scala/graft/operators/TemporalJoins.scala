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
    *
    * Null semantics follow SQL ASOF equality/inequality (and hence the
    * DuckDB-oracle behavior): a right row with a null key or null time can
    * never match anything (`null = k` and `t >= null` are both
    * never-true), so those rows are dropped from the right side up front —
    * without that filter, Window.partitionBy would happily group null keys
    * together and a null time would sort as "earliest ever" and be carried
    * into every left row. Left rows always survive; a left row with a null
    * key or null time just gets a null `asofCol` (it sorts before any
    * real-timed right row in its partition).
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
    val rNorm = right
      .filter(col(key).isNotNull && col(time).isNotNull)
      .select(
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
    *
    * `maxBucketsPerInterval` fails fast (per row, with the offending span
    * in the error) instead of letting one open-ended sentinel interval
    * (end = Long.MaxValue is a common idiom) ask `sequence()` for 10^11
    * elements and kill the whole job. The two inputs must have disjoint
    * column names — the output carries both sides' columns unprefixed.
    */
  def rangeJoin(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      pointCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val shared = intervals.columns.toSet.intersect(points.columns.toSet)
    require(shared.isEmpty,
      s"intervals and points must have disjoint column names, both have: ${shared.mkString(", ")}")
    // backticked DIV: integral division (col / lit would go through double,
    // losing precision above 2^53 — epoch nanos live there)
    val startB = expr(s"`$startCol` DIV $bucketWidth")
    val endB = expr(s"`$endCol` DIV $bucketWidth")
    val buckets = when(endB - startB < lit(maxBucketsPerInterval), sequence(startB, endB))
      .otherwise(raise_error(concat(
        lit(s"rangeJoin: interval spans "), (endB - startB + 1).cast("string"),
        lit(s" buckets (> $maxBucketsPerInterval); widen bucketWidth or cap the interval")))
        .cast("array<bigint>"))
    val iv = intervals.withColumn("__bucket", explode(buckets))
    val pts = points.withColumn("__bucket", expr(s"`$pointCol` DIV $bucketWidth"))
    iv.join(pts, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Effective-dated (SCD type 2) dimension lookup: attach to every fact
    * row the dimension VERSION that was valid at the fact's time —
    * `dim.key = fact.key AND validFrom <= fact.time < validTo` (inclusive
    * start, exclusive end: the standard slowly-changing-dimension
    * convention, so version boundaries never double-match).
    *
    * Differs from [[asof]] (latest right row at-or-before the fact) in
    * that validity is EXPLICIT: a fact outside every version's window
    * matches nothing (asof would still carry the stale latest row), and a
    * retroactively closed version stops matching without rewriting facts.
    *
    * Plan shape: an equi-join on the key with the range as a join
    * condition — broadcast for a normal dimension, sort-merge above the
    * threshold; per-key version counts are small by construction, so the
    * range post-filter touches a handful of rows per fact. Never a nested
    * loop. Both inputs share only `key`; other column names must be
    * disjoint.
    */
  def effectiveDatedJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      factTime: String,
      validFrom: String,
      validTo: String,
      joinType: String = "inner"): DataFrame = {
    // right/full would emit unmatched DIM rows whose key column (projected
    // from the fact side) is null — unidentifiable results; audit unmatched
    // versions with a dedicated anti-join instead
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"effectiveDatedJoin supports inner/left joins, got '$joinType'")
    val shared = facts.columns.toSet.intersect(dim.columns.toSet) - key
    require(shared.isEmpty,
      s"non-key column names must be disjoint, both sides have: ${shared.mkString(", ")}")
    val f = facts.alias("sd_f")
    val d = dim.alias("sd_d")
    val cond = col(s"sd_f.`$key`") === col(s"sd_d.`$key`") &&
      col(s"sd_f.`$factTime`") >= col(s"sd_d.`$validFrom`") &&
      col(s"sd_f.`$factTime`") < col(s"sd_d.`$validTo`")
    val dimCols = dim.columns.filterNot(_ == key).map(c => col(s"sd_d.`$c`"))
    f.join(d, cond, joinType).select(col("sd_f.*") +: dimCols: _*)
  }

  /** Keyed event-time interval join: every (left, right) pair with the same
    * `key` and `right.time` within `[left.time + lowerMs, left.time +
    * upperMs]` (closed bounds; `lowerMs` may be negative for
    * look-behind). Works in BOTH batch and Structured Streaming:
    *
    *  - batch: a plain equi-join on `key` with the range as a post-filter —
    *    one shuffle per side, never a nested loop;
    *  - streaming (`watermarkDelay = Some(d)`): the canonical
    *    stream-stream join. Both sides are watermarked and the range
    *    condition sits on the two event-time columns, which is exactly what
    *    lets Spark bound the join state: a buffered left row is dropped
    *    once the right watermark passes `left.time + upperMs`, and vice
    *    versa — without the time condition the state grows forever.
    *    `left_outer` additionally emits unmatched left rows (right columns
    *    null) once the watermark proves no match can arrive, matching
    *    Flink's interval-join + one-sided-outer semantics.
    *
    * `leftTime`/`rightTime` must be TimestampType (the watermark
    * requirement); both inputs carry `key` under the same name, all other
    * column names must be disjoint. Output: every left column, then the
    * right side's non-key columns.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      lowerMs: Long,
      upperMs: Long,
      watermarkDelay: Option[String] = None,
      joinType: String = "inner"): DataFrame = {
    require(lowerMs <= upperMs, s"empty interval: lowerMs=$lowerMs > upperMs=$upperMs")
    val shared = left.columns.toSet.intersect(right.columns.toSet) - key
    require(shared.isEmpty,
      s"non-key column names must be disjoint, both sides have: ${shared.mkString(", ")}")
    val l = watermarkDelay.fold(left)(d => left.withWatermark(leftTime, d)).alias("ij_l")
    val r = watermarkDelay.fold(right)(d => right.withWatermark(rightTime, d)).alias("ij_r")
    val lt = col(s"ij_l.`$leftTime`")
    val rt = col(s"ij_r.`$rightTime`")
    val cond = col(s"ij_l.`$key`") === col(s"ij_r.`$key`") &&
      rt >= lt + expr(s"INTERVAL '$lowerMs' MILLISECOND") &&
      rt <= lt + expr(s"INTERVAL '$upperMs' MILLISECOND")
    val rightCols = right.columns.filterNot(_ == key).map(c => col(s"ij_r.`$c`"))
    l.join(r, cond, joinType).select(col("ij_l.*") +: rightCols: _*)
  }
}
