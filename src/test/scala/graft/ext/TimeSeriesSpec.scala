package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val HourNanos = 3600L * 1000000000L

  /** Events frame with one event per hour index, ts in int64 nanos (the
    * QueryCatalog.table representation).
    */
  private def df(values: Seq[Double], series: String = "s") = {
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) => (series, i.toLong * HourNanos, v) }
      .toDF("event_type", "ts", "value")
  }

  /** Sequential reference for the moments -> (mu, sigma) IEEE tree, exact
    * integer moments via BigInt like the operator's DECIMAL(38,0) sums.
    */
  private def muSigma(cents: Seq[Long]): (Double, Double) = {
    val n = cents.size.toDouble
    val s = cents.map(BigInt(_)).sum.toDouble
    val s2 = cents.map(c => BigInt(c) * BigInt(c)).sum.toDouble
    val mu = s / n
    (mu, math.sqrt(math.max(0.0, (s2 / n) - (mu * mu))))
  }

  test("acf matches the direct mean-subtracted definition") {
    val vals = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 5.0, 8.0, 7.0, 9.0)
    val cents = vals.map(v => math.round(v * 100))
    val n = cents.size
    val mu = cents.sum.toDouble / n
    val den = cents.map(c => (c - mu) * (c - mu)).sum
    def direct(k: Int) =
      (0 until n - k).map(t => (cents(t) - mu) * (cents(t + k) - mu)).sum / den
    val got = TimeSeries.acf(df(vals), maxLag = 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    for (k <- 1 to 3)
      assert(math.abs(got(k) - direct(k)) < 1e-12, s"lag $k: ${got(k)} vs ${direct(k)}")
  }

  test("acf is exact under any partitioning (decimal moments, fixed IEEE tree)") {
    val vals = (1 to 200).map(i => ((i * 37) % 97) / 4.0)
    def run(parts: Int) = TimeSeries.acf(df(vals).repartition(parts), maxLag = 12)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).sortBy(_._1).toSeq
    assert(run(1) == run(7) && run(7) == run(32))
  }

  test("acf yields NULL for a constant series (zero variance)") {
    val got = TimeSeries.acf(df(Seq.fill(20)(5.0)), maxLag = 3).collect()
    assert(got.length == 3 && got.forall(_.isNullAt(3)))
  }

  test("dominantPeriod detects a planted period-7 waveform") {
    val wave = Seq(30.0, 10.0, -20.0, -40.0, -20.0, 10.0, 30.0)
    val vals = (0 until 70).map(t => 100.0 + wave(t % 7))
    val got = TimeSeries.dominantPeriod(df(vals), maxLag = 20, minLag = 2).collect()
    assert(got.length == 1 && got(0).getInt(1) == 7, got.mkString)
  }

  test("cusum matches a sequential reference scan bitwise, including resets") {
    val vals = (0 until 40).map(i => 10.0 + ((i * 13) % 5) * 0.25) ++
      (0 until 20).map(i => 14.0 + ((i * 7) % 5) * 0.25)
    val cents = vals.map(v => math.round(v * 100))
    val (mu, sigma) = muSigma(cents)
    val k = 0.5 * sigma; val h = 4.0 * sigma
    var sp = 0.0; var sn = 0.0
    val ref = cents.map { c =>
      val dev = c.toDouble - mu
      val spNew = math.max(0.0, (sp + dev) - k)
      val snNew = math.max(0.0, (sn - dev) - k)
      val up = spNew > h; val dn = snNew > h
      sp = if (up) 0.0 else spNew
      sn = if (dn) 0.0 else snNew
      (spNew, snNew, up, dn)
    }
    val got = TimeSeries.cusum(df(vals)).collect()
      .map(r => (r.getLong(1), (r.getDouble(4), r.getDouble(5), r.getBoolean(6), r.getBoolean(7))))
      .sortBy(_._1).map(_._2).toSeq
    assert(got == ref)
    assert(ref.exists(_._3), "planted +4-sigma shift must raise an up alarm")
    val firstAlarm = ref.indexWhere(_._3)
    assert(firstAlarm >= 40, s"alarm at $firstAlarm fired before the shift")
    // reset semantics: the statistic restarts from 0 after the alarm step
    assert(ref(firstAlarm + 1)._1 < ref(firstAlarm)._1)
  }

  test("cusum stays silent on a constant series") {
    val got = TimeSeries.cusum(df(Seq.fill(30)(7.0))).collect()
    assert(got.length == 30 && got.forall(r => !r.getBoolean(6) && !r.getBoolean(7)))
  }

  test("cusum isolates series: one shifted series never alarms its neighbor") {
    val flat = df((0 until 50).map(_ => 10.0), "flat")
    val shifted = df((0 until 30).map(_ => 10.0) ++ (0 until 20).map(_ => 20.0), "shift")
    val got = TimeSeries.cusum(flat.union(shifted)).collect()
    val byrSeries = got.groupBy(_.getString(0))
    assert(byrSeries("flat").forall(r => !r.getBoolean(6) && !r.getBoolean(7)))
    assert(byrSeries("shift").exists(_.getBoolean(6)))
  }

  test("ewma matches the sequential recurrence bitwise; resid is NULL at t=1") {
    val vals = (1 to 50).map(i => ((i * 29) % 31) / 2.0)
    val cents = vals.map(v => math.round(v * 100))
    var s = cents.head.toDouble
    val ref = (cents.head.toDouble, Option.empty[Double]) +:
      cents.tail.map { c =>
        val resid = c.toDouble - s
        s = s + 0.2 * (c.toDouble - s)
        (s, Some(resid))
      }
    val got = TimeSeries.ewma(df(vals), alpha = 0.2).collect()
      .map(r => (r.getLong(1), (r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
      .sortBy(_._1).map(_._2).toSeq
    assert(got == ref)
  }

  test("holt matches the sequential error-correction recurrence bitwise") {
    val vals = (1 to 60).map(i => 5.0 * i + ((i * 23) % 17) / 4.0) // trend + noise
    val cents = vals.map(v => math.round(v * 100))
    var l = cents.head.toDouble
    var b = 0.0
    val ref = ((l, 0.0, Option.empty[Double])) +:
      cents.tail.map { c =>
        val f = l + b
        val e = c.toDouble - f
        l = f + 0.2 * e
        b = b + (0.2 * 0.1) * e
        (l, b, Some(e))
      }
    val got = TimeSeries.holt(df(vals), alpha = 0.2, beta = 0.1).collect()
      .map(r => (r.getLong(1), (r.getDouble(4), r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))))
      .sortBy(_._1).map(_._2).toSeq
    assert(got == ref)
  }

  test("holt tracks a pure linear trend: residuals shrink toward zero; ewma's do not") {
    val vals = (1 to 80).map(i => 10.0 * i)
    val holtResid = TimeSeries.holt(df(vals)).collect()
      .filter(!_.isNullAt(6)).map(r => (r.getLong(1), math.abs(r.getDouble(6))))
      .sortBy(_._1).map(_._2)
    val ewmaResid = TimeSeries.ewma(df(vals)).collect()
      .filter(!_.isNullAt(5)).map(r => (r.getLong(1), math.abs(r.getDouble(5))))
      .sortBy(_._1).map(_._2)
    assert(holtResid.last < holtResid.head / 2,
      s"holt residual must shrink on a linear ramp: ${holtResid.head} -> ${holtResid.last}")
    assert(ewmaResid.last > holtResid.last * 2,
      "a trend-blind ewma must keep lagging where holt has converged")
  }

  test("holt isolates series and restarts state at each boundary") {
    val a = df((1 to 20).map(i => 2.0 * i), "a")
    val c = df(Seq.fill(20)(7.0), "c")
    val got = TimeSeries.holt(a.union(c)).collect()
    val bySeries = got.groupBy(_.getString(0))
    assert(bySeries("c").forall(r => r.getDouble(5) == 0.0), "flat series: zero trend")
    val firstRows = got.filter(_.getLong(1) == 1L)
    assert(firstRows.length == 2 && firstRows.forall(_.isNullAt(6)))
  }

  /** Independent sequential Viterbi over integer bands (mirrors the
    * operator's fixed score tables and smallest-state tie-breaks). */
  private def refViterbi(cents: Seq[Long]): Seq[Int] = {
    val mn = cents.min; val mx = cents.max
    val t1 = mn + (mx - mn) / 3; val t2 = mn + 2 * (mx - mn) / 3
    val bands = cents.map(x => if (x < t1) 0 else if (x < t2) 1 else 2)
    def e(s: Int, b: Int) = math.abs(s - b) match { case 0 => 0L; case 1 => -80L; case _ => -400L }
    def tr(s: Int, sp: Int) = math.abs(s - sp) match { case 0 => 0L; case 1 => -120L; case _ => -240L }
    val n = bands.length
    var dp = (0 until 3).map(s => e(s, bands(0))).toArray
    val bp = Array.ofDim[Int](n, 3)
    for (t <- 1 until n) {
      val nd = new Array[Long](3)
      for (sp <- 0 until 3) {
        val c = (0 until 3).map(s => dp(s) + tr(s, sp))
        val m = c.max
        bp(t)(sp) = c.indexOf(m)
        nd(sp) = m + e(sp, bands(t))
      }
      dp = nd
    }
    val path = new Array[Int](n)
    path(n - 1) = if (dp(0) >= dp(1) && dp(0) >= dp(2)) 0 else if (dp(1) >= dp(2)) 1 else 2
    for (t <- n - 1 until 0 by -1) path(t - 1) = bp(t)(path(t))
    path.toSeq
  }

  test("viterbi equals the sequential DP reference on a noisy two-regime series") {
    val vals = (0 until 40).map(i => 10.0 + ((i * 13) % 7) * 0.25) ++
      (0 until 40).map(i => 30.0 + ((i * 11) % 7) * 0.25)
    val cents = vals.map(v => math.round(v * 100))
    val want = refViterbi(cents)
    val got = TimeSeries.viterbi(df(vals)).collect()
      .map(r => r.getLong(1) -> r.getLong(5).toInt).sortBy(_._1).map(_._2).toSeq
    assert(got == want)
    // the planted regimes are actually recovered
    assert(got.take(40).forall(_ == 0) && got.drop(40).count(_ == 2) > 30, s"$got")
  }

  test("viterbi smooths a single-bucket spike but follows a sustained shift") {
    // long low run with ONE mid-band bucket: emission miss (-80) beats
    // two adjacent transitions (-240), so the spike decodes as state 0
    val lo = 10.0; val mid = 20.0; val hi = 31.0
    val spike = Seq.fill(10)(lo) ++ Seq(mid) ++ Seq.fill(10)(lo) ++ Seq(hi) // hi pins t2
    val got = TimeSeries.viterbi(df(spike)).collect()
      .map(r => r.getLong(1) -> (r.getLong(4), r.getLong(5))).toMap
    assert(got(11L)._1 == 1L, "the spike bucket is band 1")
    assert(got(11L)._2 == 0L, "but decodes to the surrounding regime")
    // sustained: five mid buckets flip the state
    val shift = Seq.fill(10)(lo) ++ Seq.fill(5)(mid) ++ Seq.fill(10)(lo) ++ Seq(hi)
    val got2 = TimeSeries.viterbi(df(shift)).collect()
      .map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert((11L to 15L).forall(got2(_) == 1L), s"sustained mid run must decode as state 1: $got2")
  }

  test("viterbi: constant series bands 2 everywhere and decodes constant state 2") {
    val got = TimeSeries.viterbi(df(Seq.fill(12)(5.0))).collect()
    assert(got.length == 12 && got.forall(r => r.getLong(4) == 2L && r.getLong(5) == 2L))
  }

  test("viterbi isolates series and is partition-invariant") {
    val a = df((0 until 30).map(i => if (i < 15) 10.0 else 30.0), "a")
    val c = df(Seq.fill(30)(7.0), "c")
    def run(parts: Int) = TimeSeries.viterbi(a.union(c).repartition(parts)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5))).sortBy(x => (x._1, x._2)).toSeq
    val got = run(1)
    assert(got == run(13))
    val byS = got.groupBy(_._1)
    assert(byS("c").forall(_._3 == 2L), "constant neighbor stays in its own regime")
    assert(byS("a").map(_._3).distinct.size == 2, "the shifted series uses two states")
  }

  test("bucketSeries sums cents per bucket and drops null keys/values") {
    import spark.implicits._
    val e = Seq(
      ("a", 100L * 1000000000L, 1.25), // bucket 0
      ("a", 200L * 1000000000L, 2.00), // bucket 0
      ("a", 3700L * 1000000000L, 0.50), // bucket 1
      (null, 100L * 1000000000L, 9.0),
      ("a", 100L * 1000000000L, Double.NaN)).toDF("event_type", "ts", "value")
      .withColumn("value",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.isnan(org.apache.spark.sql.functions.col("value")),
          null).otherwise(org.apache.spark.sql.functions.col("value")))
    val got = TimeSeries.bucketSeries(e).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._2).toSeq
    assert(got == Seq(("a", 0L, 325L, 1L), ("a", 1L, 50L, 2L)))
  }

  test("gapFill: interior gaps interpolate on the cents grid, spans stay per-series") {
    import spark.implicits._
    // series a: hours 0,1,3,6 (gaps at 2,4,5); series b: dense 10,11
    val e = Seq(
      ("a", 0L, 1.00), ("a", 1L, 2.00), ("a", 3L, 4.00), ("a", 6L, 1.00),
      ("b", 10L, 5.00), ("b", 11L, 6.00)
    ).map { case (s, h, v) => (s, h * HourNanos, v) }.toDF("event_type", "ts", "value")
    val got = TimeSeries.gapFill(e).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.size == 9, "7 slots for a (0..6) + 2 for b (10..11)")
    assert(got(("a", 0L)) == (100.0, false) && got(("a", 1L)) == (200.0, false))
    assert(got(("a", 2L)) == (300.0, true), "midpoint of 200 and 400")
    assert(got(("a", 3L)) == (400.0, false))
    // linear ramp 400 -> 100 over 3 hours: 300, 200 at hours 4, 5
    assert(got(("a", 4L)) == (300.0, true) && got(("a", 5L)) == (200.0, true))
    assert(got(("a", 6L)) == (100.0, false))
    assert(got(("b", 10L)) == (500.0, false) && got(("b", 11L)) == (600.0, false))
    // no slot bleeds outside either span
    assert(!got.contains(("b", 9L)) && !got.contains(("a", 7L)))
  }

  test("gapFill: non-integral interpolation is the exact fixed IEEE tree; partition-invariant") {
    import spark.implicits._
    val e = Seq(("s", 0L, 0.00), ("s", 3L, 1.00))
      .map { case (s, h, v) => (s, h * HourNanos, v) }.toDF("event_type", "ts", "value")
    def run(parts: Int) = TimeSeries.gapFill(e.repartition(parts)).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val got = run(1)
    // pv + ((nv-pv)*(b-pb))/(nb-pb) with pv=0, nv=100, nb=3
    assert(got(1L) == 0.0 + ((100.0 - 0.0) * 1.0) / 3.0)
    assert(got(2L) == 0.0 + ((100.0 - 0.0) * 2.0) / 3.0)
    assert(run(1) == run(13), "grid + windows must be partition-invariant")
  }
}
