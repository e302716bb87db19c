package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class WaveletSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val HourNanos = 3600L * 1000000000L

  private def df(values: Seq[Double], series: String = "s") = {
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) => (series, i.toLong * HourNanos, v) }
      .toDF("event_type", "ts", "value")
  }

  /** Independent unnormalized Haar + ranking. */
  private def ref(cents: Seq[Long], n: Int, k: Int): Seq[(Long, Long, Long, Long)] = {
    var a = (cents.take(n) ++ Seq.fill(n - math.min(n, cents.length))(0L)).toArray
    val levels = java.lang.Integer.numberOfTrailingZeros(n)
    val coefs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    for (lv <- 1 to levels) {
      val na = new Array[Long](a.length / 2)
      for (i <- na.indices) {
        na(i) = a(2 * i) + a(2 * i + 1)
        coefs += ((lv, i + 1, a(2 * i) - a(2 * i + 1)))
      }
      a = na
    }
    coefs += ((levels + 1, 1, a(0)))
    coefs.sortBy { case (lv, p, c) => (-math.abs(c), lv, p) }.take(k)
      .zipWithIndex.map { case ((lv, p, c), i) => ((i + 1).toLong, lv.toLong, p.toLong, c) }
      .toSeq
  }

  test("a constant series concentrates ALL energy in the final approximation") {
    val got = Wavelet.synopsis(df(Seq.fill(8)(5.0)), n = 8, k = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    // details all zero; rank 1 = level 4 approx = 8 * 500 cents
    assert(got.head == ((1L, 4L, 1L, 4000L)), s"$got")
    assert(got.tail.forall(_._4 == 0L), "every detail of a constant series is zero")
  }

  test("a single step change puts the energy at the step's scale and position") {
    // 4 low then 4 high: the level-3 detail (first half - second half) dominates
    val got = Wavelet.synopsis(df(Seq(1.0, 1.0, 1.0, 1.0, 9.0, 9.0, 9.0, 9.0)), n = 8, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got(1) == ((2L, 3L, 1L, 4 * 100L - 4 * 900L)),
      s"the step lives in the coarsest detail: $got")
  }

  test("matches the independent reference on noisy series incl. zero-padding") {
    val rnd = new scala.util.Random(97)
    val vals = (0 until 300).map(_ => rnd.nextInt(2000) / 100.0) // series shorter than n=512
    val cents = vals.map(v => math.round(v * 100))
    val want = ref(cents, 512, 16)
    val got = Wavelet.synopsis(df(vals), n = 512, k = 16).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == want)
  }

  test("the kept set is exactly the |coef| order statistic (no dropped coef outranks a kept one)") {
    val rnd = new scala.util.Random(101)
    val vals = (0 until 64).map(i => if (i % 17 == 0) 500.0 else rnd.nextInt(10) / 10.0)
    val cents = vals.map(v => math.round(v * 100))
    val all = ref(cents, 64, 65).map(_._4).map(math.abs).sorted.reverse
    val kept = ref(cents, 64, 8).map(_._4).map(math.abs)
    assert(kept.min >= all(8), "every kept |coef| >= the best dropped |coef|")
    assert(kept.sorted.reverse == all.take(8), "the kept multiset IS the top-8 order statistic")
  }

  test("series are isolated and the scan is partition-invariant") {
    val a = df((0 until 16).map(i => i.toDouble), "a")
    val c = df(Seq.fill(16)(3.0), "c")
    def run(parts: Int) = Wavelet.synopsis(a.union(c).repartition(parts), n = 16, k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val got = run(1)
    assert(got == run(13))
    assert(got.map(_._1) == Set("a", "c"))
  }
}
