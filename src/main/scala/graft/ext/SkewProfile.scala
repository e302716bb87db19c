package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ======== Join-key skew profiling ========
  *
  * The diagnostic that decides between a plain shuffle join, AQE skew
  * handling, and explicit salting at 100 TB: the shape of the per-key
  * row histogram. One aggregation reduces the relation to its key
  * histogram; the profile row then reports cardinality, the heaviest
  * key's absolute count and share, the top-10 share, and exact discrete
  * p50/p99 of the per-key counts plus the max/p50 ratio — the numbers a
  * planner (or an engineer) reads before picking a strategy.
  *
  * Determinism: every rank order is totalized by (count, key); shares
  * and ratios are single IEEE divisions over exact integer counts —
  * bitwise portable (the percentile POSITIONS use `ceil(n_keys · q)`,
  * one correctly-rounded multiply both engines perform identically).
  *
  * Scale plan (round 16 — this file previously ranked the key histogram
  * with three GLOBAL windows, funneling all |keys| rows through one
  * partition; under skew profiling |keys| is billions by the tool's own
  * premise): the key histogram is reduced a second time to its
  * COUNT-VALUE histogram — `groupBy(cnt)` with full map-side combine,
  * so what reaches the final single-row aggregate is one struct per
  * DISTINCT per-key count (Zipfian data: ~O(√n_rows) values, each 16
  * bytes), not one row per key. Exact order statistics then fall out of
  * a sorted-array fold: the element at ascending rank `ceil(n_keys·q)`
  * is the smallest count whose cumulative frequency reaches the rank,
  * and the top-10 mass is a bounded descending walk with multiplicity.
  * Ties in the old rank order were broken by key, which only ever chose
  * AMONG equal counts — so every emitted value is bit-identical to the
  * window formulation the DuckDB oracle still replays.
  */
object SkewProfile {

  /** One profile row for `keyCol` of `df`, labeled `label`. */
  def profile(df: DataFrame, keyCol: String, label: String): DataFrame = {
    val counts = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("cnt"))
    // distinct count-values with multiplicity: the only relation small
    // enough to sort inside one row, and it reaches that row combined
    val hist = counts.groupBy("cnt").agg(count(lit(1)).as("freq"))
    hist
      .agg(
        sum(col("cnt") * col("freq")).as("n_rows"),
        sum(col("freq")).as("n_keys"),
        max(col("cnt")).as("max_count"),
        sort_array(collect_list(struct(col("cnt"), col("freq")))).as("h"))
      // smallest cnt whose cumulative frequency reaches the ascending rank
      // ceil(n_keys * q) — exactly the row the old row_number() selected
      .withColumn("p50_count", rankSelect(0.5))
      .withColumn("p99_count", rankSelect(0.99))
      // top-10 keys by (cnt desc): walk the histogram from the heavy end
      // with a 10-key budget, taking multiplicity until the budget is spent
      .withColumn("top10_rows", expr(
        """aggregate(reverse(h),
          |  named_struct('left', CAST(10 AS BIGINT), 'tot', CAST(0 AS BIGINT)),
          |  (acc, x) -> named_struct(
          |    'left', greatest(CAST(0 AS BIGINT), acc.left - x.freq),
          |    'tot', acc.tot + least(acc.left, x.freq) * x.cnt),
          |  acc -> acc.tot)""".stripMargin))
      .select(
        lit(label).as("key_col"),
        col("n_rows"), col("n_keys"), col("max_count"),
        (col("max_count").cast("double") / col("n_rows")).as("max_share"),
        (col("top10_rows").cast("double") / col("n_rows")).as("top10_share"),
        col("p50_count"), col("p99_count"),
        (col("max_count").cast("double") / col("p50_count")).as("skew_ratio"))
  }

  /** The count value at ascending per-key rank `ceil(n_keys * q)`: a fold
    * over the sorted count-value histogram that latches the first count
    * whose cumulative frequency reaches the rank. NULL on an empty
    * histogram (matching an aggregate over an empty relation).
    */
  private def rankSelect(q: Double) = expr(
    s"""aggregate(h,
       |  named_struct('seen', CAST(0 AS BIGINT), 'v', CAST(NULL AS BIGINT)),
       |  (acc, x) -> IF(acc.v IS NOT NULL, acc,
       |    named_struct('seen', acc.seen + x.freq,
       |      'v', IF(acc.seen + x.freq >=
       |              CAST(ceil(CAST(n_keys AS DOUBLE) * $q) AS BIGINT),
       |            x.cnt, CAST(NULL AS BIGINT)))),
       |  acc -> acc.v)""".stripMargin)

  /** Profiles for several (table, key) pairs unioned into one relation. */
  def profiles(targets: Seq[(DataFrame, String, String)]): DataFrame = {
    require(targets.nonEmpty)
    targets.map { case (df, key, label) => profile(df, key, label) }.reduce(_.unionAll(_))
  }
}
