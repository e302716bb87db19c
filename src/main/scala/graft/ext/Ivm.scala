package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ======== Incremental view maintenance (Δ-processing) ========
  *
  * Maintain a grouped aggregate view under a change log WITHOUT
  * recomputing it from the base relation — the materialized-view
  * algebra (Gupta & Mumick, "Maintenance of Materialized Views", IEEE
  * DE Bulletin 1995): COUNT and SUM are self-maintainable under inserts
  * AND deletes (Δview is itself an aggregate of the delta, signed +1
  * for inserts, −1 for retractions), so the maintained view is
  *
  *   view' = combine(view(base), Δ(log))   — two aggregates + one
  *   key-partitioned outer join, never a base rescan.
  *
  * Groups whose maintained count reaches zero DISAPPEAR (exact multiset
  * semantics, not a zero-row); a retraction of a row that was never in
  * the base simply drives the signed sums — garbage-in-garbage-out is
  * the caller's contract, as in every IVM engine. AVG rides along as
  * one IEEE division of the exact maintained integers (the
  * self-maintainable-through-(SUM, COUNT) trick; MIN/MAX are NOT
  * self-maintainable under deletes and are deliberately absent — the
  * documented boundary of the algebra).
  *
  * The correctness gate is the IVM identity itself: the oracle computes
  * the view DIRECTLY from the effective multiset (base ∖ retracted ∪
  * inserted) with no delta algebra anywhere, so the incremental path
  * must equal a full recompute bitwise.
  *
  * 100 TB shape: the base view aggregates once (or is already
  * materialized); each maintenance cycle touches ONLY the delta — one
  * map-side-combinable signed aggregate over the log, one outer merge
  * join on the group key. Nothing rescans, nothing is quadratic.
  */
object Ivm {

  /** Signed delta aggregate + merge. `delta` carries `opCol` with
    * `insertOp`/`retractOp` rows; both inputs must share `keyCol` and
    * the integer `valueCol` (exact cents — the caller fixes the
    * scaling). Output: (key, n, sum_cents, avg_value).
    */
  def maintainAgg(
      base: DataFrame,
      delta: DataFrame,
      keyCol: String,
      valueCol: String,
      opCol: String = "op",
      insertOp: String = "I",
      retractOp: String = "R"): DataFrame = {
    val viewBase = base
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"))
    val sign = when(col(opCol) === insertOp, 1L)
      .when(col(opCol) === retractOp, -1L)
    val viewDelta = delta
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull && sign.isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(sign).as("dn"), sum(sign * col(valueCol)).as("ds"))
    viewBase.join(viewDelta, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("sum_cents"))
      .filter(col("n") =!= 0L)
      .withColumn("avg_value",
        col("sum_cents").cast("double") / col("n").cast("double"))
  }
}
