package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ======== Histogram-based selectivity estimation ========
  *
  * The third leg of the optimizer-statistics trilogy ([[JoinOrder]]
  * costs orders, [[graft.ext.Sketches.cmsJoinSize]] estimates join
  * sizes, this estimates PREDICATE selectivity): build the V-optimal
  * histogram (Jagadish et al., VLDB 1998 — the same exact integer DP as
  * `vopt_histogram`, here over the attribute's (value, frequency)
  * domain instead of a time series) and answer `x <= V` range probes
  * by full-bucket sums plus the uniform-within-bucket interpolation
  *
  *   est = Σ_{full} f  +  ⌊ f_partial · (V − lo + 1) / (hi − lo + 1) ⌋
  *
  * — all integer, floor order pinned. The exact counts ride along as
  * the evaluation harness (the `cms_join_size` convention), so the
  * gate grades estimate and truth together.
  *
  * Scale contract: the frequency relation is one hash aggregate whose
  * cardinality is the attribute's distinct-value count — bounded
  * domains (quantities, dates, enums) stay tiny at any corpus size,
  * and `maxDistinct` caps the DP input for unbounded ones (the
  * statistics-on-a-bounded-sample convention of `vopt_histogram`,
  * replayed by the oracle). The DP runs on the driver over that
  * bounded table; the probe answers are O(B) arithmetic.
  */
object Selectivity {

  /** V-opt histogram + range-probe estimates for `valueCol` (fixed-point
    * cents). Output: (v_cut, est_rows, exact_rows, err) per probe.
    */
  def estimate(rel: DataFrame, valueCol: String, probes: Seq[Long],
      buckets: Int = 4, maxDistinct: Int = 4096): DataFrame = {
    require(buckets >= 1 && probes.nonEmpty)
    val spark = rel.sparkSession
    val cents = expr(s"CAST(round($valueCol * 100) AS LONG)")
    val freqDf = rel.filter(col(valueCol).isNotNull)
      .groupBy(cents.as("val")).agg(count(lit(1)).as("f"))
    val freq = freqDf.orderBy("val").limit(maxDistinct).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = freq.length
    require(n >= buckets, s"need at least $buckets distinct values, got $n")
    val p = new Array[Long](n + 1); val q = new Array[Long](n + 1)
    for (i <- 1 to n) {
      p(i) = p(i - 1) + freq(i - 1)._2
      q(i) = q(i - 1) + freq(i - 1)._2 * freq(i - 1)._2
    }
    def cost(j: Int, i: Int): Long =
      (i - j).toLong * (q(i) - q(j)) - (p(i) - p(j)) * (p(i) - p(j))
    var prev = Array.tabulate(n + 1)(i => if (i >= 1) cost(0, i) else Long.MaxValue)
    val par = Array.ofDim[Int](buckets + 1, n + 1)
    for (lvl <- 2 to buckets) {
      val cur = Array.fill(n + 1)(Long.MaxValue)
      for (i <- lvl to n) {
        var best = Long.MaxValue; var arg = 0
        var j = lvl - 1
        while (j < i) {
          val v = prev(j) + cost(j, i)
          if (v < best) { best = v; arg = j }
          j += 1
        }
        cur(i) = best; par(lvl)(i) = arg
      }
      prev = cur
    }
    val bounds = new Array[Int](buckets + 1)
    bounds(buckets) = n
    for (k <- buckets until 1 by -1) bounds(k - 1) = par(k)(bounds(k))
    // (v_lo, v_hi, f_total) per bucket
    val bks = (1 to buckets).map { bk =>
      val s0 = bounds(bk - 1) + 1; val e0 = bounds(bk)
      (freq(s0 - 1)._1, freq(e0 - 1)._1, p(e0) - p(s0 - 1))
    }
    def est(v: Long): Long = bks.map { case (lo, hi, f) =>
      if (hi <= v) f
      else if (lo > v) 0L
      else f * (v - lo + 1) / (hi - lo + 1)
    }.sum
    // exact counts in ONE pass over the FULL frequency relation (not the
    // maxDistinct-capped DP input — truth is truth even when the
    // histogram was built on a prefix)
    val aggs = probes.map(v =>
      coalesce(sum(when(col("val") <= v, col("f"))), lit(0L)).as(s"e$v"))
    val exactRow = freqDf.agg(aggs.head, aggs.tail: _*).head
    val exact = probes.zipWithIndex.map { case (v, i) => v -> exactRow.getLong(i) }.toMap
    val rows = probes.map { v => Row(v, est(v), exact(v), est(v) - exact(v)) }
    val schema = StructType(Seq(
      StructField("v_cut", LongType), StructField("est_rows", LongType),
      StructField("exact_rows", LongType), StructField("err", LongType)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
