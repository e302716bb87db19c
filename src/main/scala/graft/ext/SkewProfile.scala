package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale note: the ranking windows run over the already-reduced key
  * histogram (|keys| rows, not |rows|); at key cardinalities where a
  * single-partition window over the histogram itself hurts, the
  * percentile moves to `approx_percentile` (the `value_quantiles`
  * accuracy-bound path) — this exact profile is the oracle-checkable
  * form.
  */
object SkewProfile {

  /** One profile row for `keyCol` of `df`, labeled `label`. */
  def profile(df: DataFrame, keyCol: String, label: String): DataFrame = {
    val counts = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = counts
      .withColumn("rd", row_number().over(Window.orderBy(col("cnt").desc, col("k"))))
      .withColumn("ra", row_number().over(Window.orderBy(col("cnt").asc, col("k"))))
      .withColumn("nk", count(lit(1)).over(Window.partitionBy()))
    ranked
      .agg(
        max(col("nk")).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_count"),
        sum(when(col("rd") <= 10, col("cnt")).otherwise(0L)).as("top10_rows"),
        max(when(col("ra") === ceil(col("nk") * lit(0.5)), col("cnt"))).as("p50_count"),
        max(when(col("ra") === ceil(col("nk") * lit(0.99)), col("cnt"))).as("p99_count"))
      .select(
        lit(label).as("key_col"),
        col("n_rows"), col("n_keys"), col("max_count"),
        (col("max_count").cast("double") / col("n_rows")).as("max_share"),
        (col("top10_rows").cast("double") / col("n_rows")).as("top10_share"),
        col("p50_count"), col("p99_count"),
        (col("max_count").cast("double") / col("p50_count")).as("skew_ratio"))
  }

  /** Profiles for several (table, key) pairs unioned into one relation. */
  def profiles(targets: Seq[(DataFrame, String, String)]): DataFrame = {
    require(targets.nonEmpty)
    targets.map { case (df, key, label) => profile(df, key, label) }.reduce(_.unionAll(_))
  }
}
