package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class VoptSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val HourNanos = 3600L * 1000000000L

  private def df(values: Seq[Double], series: String = "s") = {
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) => (series, i.toLong * HourNanos, v) }
      .toDF("event_type", "ts", "value")
  }

  /** Independent O(n²·B) DP reference in BigInt (overflow-immune). */
  private def refVopt(cents: Seq[Long], b: Int): Seq[(Int, Int, Int, Long, BigInt)] = {
    val n = cents.length
    val p = cents.scanLeft(BigInt(0))(_ + _)
    val q = cents.scanLeft(BigInt(0))((a, x) => a + BigInt(x) * x)
    def cost(j: Int, i: Int): BigInt = (q(i) - q(j)) * (i - j) - (p(i) - p(j)).pow(2)
    var prev = (0 to n).map(i => if (i >= 1) cost(0, i) else BigInt(Long.MaxValue)).toArray
    val par = Array.ofDim[Int](b + 1, n + 1)
    for (lvl <- 2 to b) {
      val cur = Array.fill(n + 1)(BigInt(Long.MaxValue))
      for (i <- lvl to n) {
        var best = BigInt(Long.MaxValue); var arg = 0
        for (j <- lvl - 1 until i) {
          val v = prev(j) + cost(j, i)
          if (v < best) { best = v; arg = j }
        }
        cur(i) = best; par(lvl)(i) = arg
      }
      prev = cur
    }
    val bounds = new Array[Int](b + 1)
    bounds(b) = n
    for (k <- b until 1 by -1) bounds(k - 1) = par(k)(bounds(k))
    (1 to b).map { bk =>
      val s0 = bounds(bk - 1) + 1; val e0 = bounds(bk)
      (bk, s0, e0, (p(e0) - p(s0 - 1)).toLong, cost(s0 - 1, e0))
    }
  }

  test("a piecewise-constant series splits exactly at its level changes") {
    val vals = Seq.fill(10)(10.0) ++ Seq.fill(10)(50.0) ++ Seq.fill(10)(20.0) ++ Seq.fill(10)(80.0)
    val got = Vopt.histogram(df(vals), buckets = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6))).sortBy(_._1)
    assert(got.map(x => (x._2, x._3)).toSeq ==
      Seq((1L, 10L), (11L, 20L), (21L, 30L), (31L, 40L)))
    assert(got.forall(_._4 == 0L), "constant buckets have zero SSE")
  }

  test("matches the independent DP reference on noisy series; ties split smallest") {
    val rnd = new scala.util.Random(31)
    val vals = (0 until 60).map(_ => rnd.nextInt(1000) / 10.0)
    val cents = vals.map(v => math.round(v * 100))
    val want = refVopt(cents, 4).map(t => (t._1.toLong, t._2.toLong, t._3.toLong, t._4, t._5.toLong))
    val got = Vopt.histogram(df(vals), buckets = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("v-opt beats equi-width SSE on skewed data") {
    // 36 near-constant values + a 4-step ramp at the end: equi-width wastes
    // three boundaries inside the flat region
    val vals = Seq.fill(36)(10.0) ++ Seq(100.0, 200.0, 300.0, 400.0)
    val cents = vals.map(v => math.round(v * 100))
    val got = Vopt.histogram(df(vals), buckets = 4).collect().map(_.getLong(6)).sum
    val p = cents.scanLeft(0L)(_ + _); val q = cents.scanLeft(0L)((a, x) => a + x * x)
    def sse(s: Int, e: Int): Long = (e - s + 1).toLong * (q(e) - q(s - 1)) -
      (p(e) - p(s - 1)) * (p(e) - p(s - 1))
    val equi = Seq((1, 10), (11, 20), (21, 30), (31, 40)).map { case (s, e) => sse(s, e) }.sum
    assert(got < equi / 4, s"v-opt $got should crush equi-width $equi on this shape")
  }

  test("short series (< B) drop; maxN caps the DP input") {
    val short = Vopt.histogram(df(Seq(1.0, 2.0, 3.0)), buckets = 4).collect()
    assert(short.isEmpty)
    val capped = Vopt.histogram(df((0 until 50).map(_.toDouble)), buckets = 4, maxN = 20)
      .collect().map(r => r.getLong(3)).max
    assert(capped == 20L, "t_end must not exceed the cap")
  }

  test("multi-series isolation and partition invariance") {
    val a = df(Seq.fill(10)(1.0) ++ Seq.fill(10)(9.0) ++ Seq.fill(10)(1.0) ++ Seq.fill(10)(9.0), "a")
    val c = df((0 until 40).map(i => (i % 7).toDouble), "c")
    def run(parts: Int) = Vopt.histogram(a.union(c).repartition(parts), buckets = 4)
      .collect().map(_.toSeq).toSet
    val got = run(1)
    assert(got == run(13))
    assert(got.map(_.head).toSet == Set("a", "c"))
    assert(got.size == 8)
  }
}
