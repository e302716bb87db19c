package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ======== Haar wavelet synopses (the third synopsis family) ========
  *
  * Histograms ([[graft.plans.Selectivity]], `vopt_histogram`), sketches
  * ([[Sketches]]), and WAVELETS are the three classical synopsis
  * families of the approximate-query-processing literature (Matias,
  * Vitter & Wang, SIGMOD 1998): keep the k largest Haar coefficients
  * of a value series and reconstruct any prefix/range sum from O(log n)
  * of them. This operator computes the UNNORMALIZED Haar transform —
  * pairwise sums as the coarser approximation, pairwise DIFFERENCES as
  * the detail coefficients, level by level — which stays entirely in
  * exact BIGINT arithmetic (the conventional √2-normalized transform is
  * irrational and engine-divergent; unnormalized coefficients carry the
  * same information with per-level weights applied at reconstruction —
  * the standard integer-wavelet trade, documented).
  *
  * Per series: the first `n` bucket values (n = 512, a power of two;
  * shorter series zero-pad — replayed by the oracle), 9 transform
  * levels, then the top-`k` coefficients by |coef| with deterministic
  * (|coef| DESC, level ASC, pos ASC) ties. Output one row per kept
  * coefficient: (series, rank, level 1..9 detail / 10 = final
  * approximation, pos, coef).
  *
  * Scale shape: the bucket roll-up shuffle, then the [[TimeSeries
  * .viterbi]] per-series buffered scan — O(n) transform work and O(n)
  * memory per series, series count providing the parallelism; the
  * n-cap is the synopsis contract (a synopsis of the prefix IS a
  * synopsis — extend by windowing upstream for longer series).
  */
object Wavelet {

  def synopsis(events: DataFrame, n: Int = 512, k: Int = 16,
      bucketMillis: Long = 3600000L, keyCol: String = "event_type"): DataFrame = {
    require(n >= 2 && (n & (n - 1)) == 0, "n must be a power of two")
    require(k >= 1)
    val levels = java.lang.Integer.numberOfTrailingZeros(n)
    val series = TimeSeries.bucketSeries(events, bucketMillis, keyCol)
      .filter(col("t") <= n)
    val out = StructType(Seq(
      StructField("series", StringType), StructField("rank", LongType),
      StructField("level", LongType), StructField("pos", LongType),
      StructField("coef", LongType)))
    series
      .select("series", "t", "x")
      .repartition(col("series"))
      .sortWithinPartitions(col("series"), col("t"))
      .mapPartitions { it =>
        val bit = it.buffered
        new Iterator[Seq[Row]] {
          def hasNext: Boolean = bit.hasNext
          def next(): Seq[Row] = {
            val s = bit.head.getString(0)
            val xs = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (bit.hasNext && bit.head.getString(0) == s) xs += bit.next().getLong(2)
            topCoefficients(s, xs, n, levels, k)
          }
        }.flatten
      }(org.apache.spark.sql.Encoders.row(out))
      .toDF()
  }

  private def topCoefficients(s: String, xs: scala.collection.Seq[Long],
      n: Int, levels: Int, k: Int): Seq[Row] = {
    var a = Array.tabulate(n)(i => if (i < xs.length) xs(i) else 0L)
    val coefs = Seq.newBuilder[(Int, Int, Long)] // (level, pos, coef)
    var lv = 1
    while (lv <= levels) {
      val half = a.length / 2
      val na = new Array[Long](half)
      var i = 0
      while (i < half) {
        na(i) = a(2 * i) + a(2 * i + 1)
        coefs += ((lv, i + 1, a(2 * i) - a(2 * i + 1)))
        i += 1
      }
      a = na
      lv += 1
    }
    coefs += ((levels + 1, 1, a(0)))
    coefs.result()
      .sortBy { case (lv, pos, c) => (-math.abs(c), lv, pos) }
      .take(k)
      .zipWithIndex
      .map { case ((lv, pos, c), i) =>
        Row(s, (i + 1).toLong, lv.toLong, pos.toLong, c)
      }
  }
}
