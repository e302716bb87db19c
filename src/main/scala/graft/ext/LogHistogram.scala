package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ======== Mergeable logarithmic-histogram quantile sketch ========
  *
  * The percentile path that still works when a group holds more values
  * than an executor can sort: bucket every value into a quarter-log2
  * bucket (a DDSketch-style log histogram — "DDSketch: a fast and
  * fully-mergeable quantile sketch with relative-error guarantees",
  * VLDB 2019 — with base γ = 2^(1/4)), and answer any quantile from the
  * bucket counts. Three properties make it THE scale path next to the
  * exact `percentile`/MAD family:
  *
  *  1. **Merge-anywhere**: the sketch state is (bucket → count); merging
  *     two sketches is bucket-wise addition — commutative and
  *     associative, so Spark's map-side combine, AQE re-plans, and
  *     cross-day roll-ups all produce the identical state regardless of
  *     partitioning or merge order. The shuffle carries at most ~250
  *     bucket rows per group, never values.
  *  2. **Relative-error bound**: a bucket spans [lb, lb·2^(1/4)), so the
  *     reported lower bound underestimates the true rank-quantile by at
  *     most a factor 2^(1/4) (≈ 18.9% one-sided; ≈ ±9% if read at the
  *     geometric midpoint) — for long-tailed latency/value data this is
  *     the guarantee that matters (uniform-width histograms lose ALL
  *     resolution at the head or the tail).
  *  3. **Bitwise-portable bucketing**: values are fixed-pointed to cents
  *     (`round(value·100)` — exact, the double is integral before the
  *     cast), the exponent `e = floor(log2(cents))` comes from an
  *     integer comparison cascade (NEVER float log — a power-of-two
  *     boundary ulp flip is exactly the cross-engine divergence the
  *     bitwise gate exists to catch, per [[Sketches]]), and the
  *     quarter-bucket is an integer shift: `sub = (cents·4 >> e) − 4`.
  *     Every derived number is integer arithmetic plus one IEEE division
  *     for the display bound, so the DuckDB oracle replays the FULL
  *     sketch state and every quantile estimate bitwise.
  *
  * Bucket index: `idx = 4·e + sub` for cents ≥ 1; all cents ≤ 0 (not in
  * this corpus, but the API is total) collapse into the reserved bucket
  * `idx = −1` with lower bound 0 — the one-store simplification of
  * DDSketch's separate negative store.
  *
  * No reference citation — `/root/reference/src/flinkarima.py` computes
  * exact per-window aggregates only; north-star observability-at-scale
  * scope.
  */
object LogHistogram {

  /** γ = 2^(1/4): each power of two is split into 4 geometric buckets. */
  val SubBits = 2
  val SubPerOctave: Int = 1 << SubBits // 4

  /** floor(log2(c)) for c >= 1, exactly, as `length(bin(c)) - 1` — the
    * binary spelling has no leading zeros, so its length IS the top-bit
    * position + 1, an integer identity both engines implement the same
    * way (never IEEE log2, whose rounding near powers of two is
    * engine-dependent). This replaced a 63-arm comparison CASCADE in
    * round 9: the cascade was exact too, but it gets INLINED at every
    * use site of the bucket expression (sub, idx, lb each reference e —
    * Catalyst's CollapseProject duplicates the tree), and several
    * kilobyte-scale copies of a 63-branch conditional pushed the
    * projection out of whole-stage codegen — 6.3s at sf0.1 for what is
    * one aggregate over 200k rows. The bin() form is three tiny
    * expressions after duplication.
    */
  private def log2Case(c: Column): Column =
    (length(bin(c)) - 1).cast("int")

  /** The identical integer identity as SQL text for the DuckDB oracle. */
  def log2CaseSql(cExpr: String): String =
    s"(length(bin($cExpr)) - 1)"

  /** Fixed-point cents: `round` yields an exactly-integral double, so the
    * long cast is the same number in both engines (Spark truncates,
    * DuckDB rounds — they only agree BECAUSE the input is integral).
    */
  private def cents(value: Column): Column = round(value * 100).cast("long")

  /** (bucket idx, lower bound in value units) for a cents column. */
  private def bucketCols(c: Column): (Column, Column) = {
    val e = log2Case(c)
    // functions.shiftright only takes a literal shift; the underlying
    // ShiftRight expression shifts by a column just fine
    val sub = (call_function("shiftright", c * SubPerOctave, e) - SubPerOctave).cast("int")
    val idx = when(c <= 0, lit(-1)).otherwise(e * SubPerOctave + sub)
    // lb in quarter-cents is (4 + sub) << e — exact integers; one IEEE
    // division by 400 converts to value units identically in both engines
    val lb4 = call_function("shiftleft", (sub + SubPerOctave).cast("long"), e)
    val lb = when(c <= 0, lit(0.0)).otherwise(lb4.cast("double") / (100.0 * SubPerOctave))
    (idx, lb)
  }

  /** Full sketch state per group: one row per non-empty bucket —
    * (group, bucket, lb, n). This IS the mergeable object: union two
    * epochs' outputs and re-sum on (group, bucket) to merge.
    */
  def sketch(df: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val c = cents(col(valueCol))
    val (idx, lb) = bucketCols(c)
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), idx.as("bucket"), lb.as("lb"))
      .groupBy(col(groupCol), col("bucket"), col("lb"))
      .agg(count(lit(1)).as("n"))
  }

  /** Rank-based quantile estimates from the sketch: for each q, the lower
    * bound of the bucket containing the rank-⌈q·n⌉ value (first bucket in
    * idx order whose cumulative count reaches the rank). The true
    * quantile x_q satisfies est ≤ x_q < est·2^(1/4).
    *
    * Shape: the sketch aggregate (bounded rows per group) + one
    * cumulative window over ≤ ~250 buckets per group + a 3-row literal
    * join — nothing here scales with the data.
    */
  def quantiles(df: DataFrame, qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      groupCol: String = "event_type", valueCol: String = "value"): DataFrame = {
    val sk = sketch(df, groupCol, valueCol)
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
    val cum = sk
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(col(groupCol))))
    val qdf = df.sparkSession.createDataFrame(
      qs.map(Tuple1.apply)).toDF("q")
    cum.crossJoin(broadcast(qdf))
      .withColumn("rank", ceil(col("q") * col("total")).cast("long"))
      .filter(col("cum") >= col("rank") && (col("cum") - col("n")) < col("rank"))
      .select(col(groupCol), col("q"), col("rank"), col("lb").as("est"))
  }
}
