package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ======== V-optimal histogram construction (optimizer statistics) ====
  *
  * The histogram a cost-based optimizer actually wants (Jagadish et al.,
  * "Optimal Histograms with Quality Guarantees", VLDB 1998): partition a
  * value sequence into B contiguous buckets minimizing total within-
  * bucket variance, by exact dynamic programming over prefix moments —
  * dp[b][i] = min over j of dp[b−1][j] + cost(j, i), with the segment
  * cost kept as the INTEGER n·Σx² − (Σx)² (n² × variance — never a
  * float, so the whole DP, its comparisons, and its tie-breaks are
  * bit-exact on any engine; argmin ties toward the smallest split
  * point). Equi-width histograms put bucket boundaries where the data
  * isn't; v-opt puts them where the variance is — the difference
  * between a selectivity estimate that is off 40× on skewed data and
  * one that is not.
  *
  * Scale contract: the DP is O(n²·B) per series — inherently, which is
  * exactly why every production optimizer builds statistics on a
  * BOUNDED SAMPLE, not the full relation. This operator does the same,
  * honestly: the per-series input is capped at the first `maxN` bucket
  * positions (`t <= maxN`, replayed by the oracle), and series shorter
  * than B buckets are dropped (no B-bucket histogram exists). Overflow
  * bound: |segment Σx| must stay under ~3·10⁹ for the squared term to
  * fit BIGINT (cents values up to ~10⁶ over 2048 buckets — far inside;
  * DuckDB would error loudly on overflow where a JVM long wraps, so the
  * gate also polices the bound).
  *
  * Per-series memory is O(n·B) dp state in one task (the [[TimeSeries
  * .viterbi]] bound); series count provides the parallelism.
  *
  * Output: (series, bkt 1..B, t_start, t_end, n, sum_cents, sse_n)
  * where sse_n = n·Σx² − (Σx)² over the bucket.
  */
object Vopt {

  def histogram(events: DataFrame, buckets: Int = 4, maxN: Int = 2048,
      bucketMillis: Long = 3600000L, keyCol: String = "event_type"): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val series = TimeSeries.bucketSeries(events, bucketMillis, keyCol)
      .filter(col("t") <= maxN)
    val out = StructType(Seq(
      StructField("series", StringType), StructField("bkt", LongType),
      StructField("t_start", LongType), StructField("t_end", LongType),
      StructField("n", LongType), StructField("sum_cents", LongType),
      StructField("sse_n", LongType)))
    series
      .select("series", "t", "bucket", "x")
      .repartition(col("series"))
      .sortWithinPartitions(col("series"), col("t"))
      .mapPartitions { it =>
        val bit = it.buffered
        new Iterator[Seq[Row]] {
          def hasNext: Boolean = bit.hasNext
          def next(): Seq[Row] = {
            val s = bit.head.getString(0)
            val xs = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (bit.hasNext && bit.head.getString(0) == s) xs += bit.next().getLong(3)
            decode(s, xs, buckets)
          }
        }.flatten
      }(org.apache.spark.sql.Encoders.row(out))
      .toDF()
  }

  /** Exact O(n²·B) DP over one series' t-ordered values; ties toward the
    * smallest split. Series shorter than B emit nothing.
    */
  private def decode(s: String, xs: scala.collection.Seq[Long], b: Int): Seq[Row] = {
    val n = xs.length
    if (n < b) return Seq.empty
    val p = new Array[Long](n + 1)
    val q = new Array[Long](n + 1)
    var i = 1
    while (i <= n) { p(i) = p(i - 1) + xs(i - 1); q(i) = q(i - 1) + xs(i - 1) * xs(i - 1); i += 1 }
    def cost(j: Int, i: Int): Long =
      (i - j).toLong * (q(i) - q(j)) - (p(i) - p(j)) * (p(i) - p(j))
    var prev = Array.tabulate(n + 1)(i => if (i >= 1) cost(0, i) else Long.MaxValue)
    val par = Array.ofDim[Int](b + 1, n + 1)
    var lvl = 2
    while (lvl <= b) {
      val cur = Array.fill(n + 1)(Long.MaxValue)
      var i = lvl
      while (i <= n) {
        var best = Long.MaxValue
        var arg = 0
        var j = lvl - 1
        while (j < i) {
          val v = prev(j) + cost(j, i)
          if (v < best) { best = v; arg = j } // strict: first min = smallest j
          j += 1
        }
        cur(i) = best
        par(lvl)(i) = arg
        i += 1
      }
      prev = cur
      lvl += 1
    }
    val bounds = new Array[Int](b + 1)
    bounds(b) = n
    var k = b
    while (k > 1) { bounds(k - 1) = par(k)(bounds(k)); k -= 1 }
    bounds(0) = 0
    (1 to b).map { bk =>
      val s0 = bounds(bk - 1) + 1
      val e0 = bounds(bk)
      Row(s, bk.toLong, s0.toLong, e0.toLong, (e0 - s0 + 1).toLong,
        p(e0) - p(s0 - 1), cost(s0 - 1, e0))
    }
  }
}
