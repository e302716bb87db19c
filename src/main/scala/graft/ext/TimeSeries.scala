package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ======== Time-series diagnostics over the event stream ========
  *
  * The model-selection companions to the SARIMAX pipeline: before a
  * seasonal model can be FIT (reference `/root/reference/src/flinkarima.py`
  * fixes `seasonal_order=(0,1,1,288)` a priori), something has to MEASURE
  * the seasonality — and after it runs, something has to watch the
  * residual stream for regime changes the per-sample z-score cannot see
  * (a slow drift never trips a pointwise threshold). This module supplies
  * both, plus the classic EWMA smoother as the cheap baseline the
  * reference's `_fallback_prediction` approximates with its tail mean
  * (flinkarima.py:119-127):
  *
  *  - [[acf]]: per-series autocorrelation at lags 1..K over fixed-width
  *    time buckets — the ACF read-out an analyst (or an auto-SARIMA
  *    order search) uses to pick the seasonal period `s`;
  *  - [[dominantPeriod]]: the argmax lag of that ACF — the one-number
  *    "detected season";
  *  - [[cusum]]: two-sided CUSUM change detection (Page 1954) with the
  *    standard k/h parameterization in sigma units, alarm + reset
  *    semantics, scanned with O(1) state per series;
  *  - [[ewma]]: exponentially-weighted moving average + residuals.
  *
  * **Bitwise portability.** Everything upstream of the final expressions
  * is integer arithmetic: values are fixed-pointed to cents
  * (`round(value·100)` — the [[LogHistogram]] convention), bucket sums
  * and all ACF moments (Σx, Σx², Σx·x₊ₖ, pair counts) accumulate as
  * exact DECIMAL(38,0), so they are identical under ANY partitioning or
  * aggregation order. The only floating point is a FIXED tree of IEEE
  * ops over those exact integers (each written as the same fully
  * parenthesized expression in Spark and the DuckDB oracle), so the
  * results hash-match bitwise. The CUSUM/EWMA recursions run the same
  * double ops in the same series order in both engines (mapPartitions
  * scan here, recursive CTE there) — order is pinned, so IEEE
  * determinism carries the gate.
  *
  * **Scale shape.** The bucket roll-up is the only corpus-wide shuffle
  * (hash aggregate on (series, bucket) with map-side combine — the
  * shuffle carries one row per non-empty bucket, never per event). The
  * ACF lag alignment is ONE per-series window sort producing all K lead
  * columns, then a hash aggregate on (series, lag); nothing is
  * quadratic in the series length and nothing sorts globally. The
  * CUSUM/EWMA scans are the secondary-sort pattern — repartition by
  * series, sort within partitions, one forward pass with O(1) state —
  * so a series only needs to STREAM through one task, not fit in its
  * memory. Series count provides the parallelism (the metric fleet's
  * node count at 100 TB); a single series longer than one task can scan
  * is the same bound every per-key ordered operator in this library
  * documents.
  */
object TimeSeries {

  /** Fixed-point cents (exactly-integral double before the cast — Spark
    * truncates, DuckDB rounds; they agree because the input is integral).
    */
  private def cents(value: org.apache.spark.sql.Column) = round(value * 100).cast("long")

  /** The bucketed integer series: one row per (series key, bucket) with
    * the exact cents sum and the 1-based position `t` in bucket order.
    * Missing buckets are simply absent — downstream lags index POSITION
    * in the observed sequence, not wall time (documented semantics; at
    * hourly buckets over the dense event fixture the two coincide for
    * all but a handful of empty hours).
    */
  def bucketSeries(events: DataFrame, bucketMillis: Long = 3600000L,
      keyCol: String = "event_type"): DataFrame = {
    val byBucket = events
      .filter(col(keyCol).isNotNull && col("value").isNotNull && col("ts").isNotNull)
      .groupBy(col(keyCol).as("series"),
        expr(s"(ts DIV 1000000) DIV $bucketMillis").as("bucket"))
      .agg(sum(cents(col("value"))).as("x"))
    byBucket.withColumn("t",
      row_number().over(Window.partitionBy("series").orderBy("bucket")).cast("long"))
  }

  /** Per-series autocorrelation at lags 1..maxLag.
    *
    * For the position-ordered series x₁..xₙ with mean μ = Σx/n, the lag-k
    * autocorrelation is
    *
    *   acf(k) = Σₜ₌₁..ₙ₋ₖ (xₜ−μ)(xₜ₊ₖ−μ) / Σₜ₌₁..ₙ (xₜ−μ)²
    *
    * computed here WITHOUT ever subtracting μ row-by-row: expanding both
    * sums leaves only order-free integer moments —
    *
    *   num(k) = Sxy − μ·(Sa + Sb) + m·μ²     (m = n−k pairs)
    *   den    = S2  − 2μ·S + n·μ²
    *
    * where Sxy = Σ xₜ·xₜ₊ₖ, Sa/Sb are the sums of the paired heads/tails
    * and S/S2 the full-series sum/sum-of-squares, ALL exact
    * DECIMAL(38,0). The float tail is one fixed expression tree over
    * those integers — bitwise-portable, and the aggregation is fully
    * map-side combinable (no ordered fold anywhere).
    *
    * Output: (series, lag, n_pairs, acf) — `acf` NULL for a constant
    * series (den = 0).
    */
  def acf(events: DataFrame, maxLag: Int = 36, bucketMillis: Long = 3600000L,
      keyCol: String = "event_type"): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val byBucket = events
      .filter(col(keyCol).isNotNull && col("value").isNotNull && col("ts").isNotNull)
      .groupBy(col(keyCol).as("series"),
        expr(s"(ts DIV 1000000) DIV $bucketMillis").as("bucket"))
      .agg(sum(cents(col("value"))).as("x"))

    // ONE series exchange carries everything: the ordered window yields all
    // K lead columns in one sort, and the UNBOUNDED window on the same
    // partitioning adds the full-series moments (n, S, S2) without a second
    // scan, a join, or a broadcast — μ and the shared denominator collapse
    // to two doubles per row before the explode widens anything.
    val w = Window.partitionBy("series").orderBy("bucket")
    val full = Window.partitionBy("series")
    val leads = (1 to maxLag).foldLeft(byBucket) { (df, k) =>
      df.withColumn(s"__l$k", lead(col("x"), k).over(w))
    }
      .withColumn("n", count(lit(1)).over(full))
      .withColumn("s", sum(col("x").cast("decimal(38,0)")).over(full))
      .withColumn("s2", sum((col("x") * col("x")).cast("decimal(38,0)")).over(full))
      .withColumn("mu", expr("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("den", expr(
        "(CAST(s2 AS DOUBLE) - ((2.0 * mu) * CAST(s AS DOUBLE))) + ((CAST(n AS DOUBLE) * mu) * mu)"))

    val lagged = leads.select(col("series"), col("x"), col("mu"), col("den"),
      explode(array((1 to maxLag).map(k =>
        struct(lit(k).as("lag"), col(s"__l$k").as("xk"))): _*)).as("p"))
      .select(col("series"), col("x"), col("mu"), col("den"), col("p.lag"), col("p.xk"))
      .filter(col("xk").isNotNull)

    // grouping (series, lag) is co-partitioned with the series exchange, so
    // this aggregate adds NO new shuffle; mu/den are constant per series and
    // ride through as min().
    val pair = lagged.groupBy("series", "lag").agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x").cast("decimal(38,0)")).as("sa"),
      sum(col("xk").cast("decimal(38,0)")).as("sb"),
      sum((col("x") * col("xk")).cast("decimal(38,0)")).as("sxy"),
      min(col("mu")).as("mu"),
      min(col("den")).as("den"))

    // The identical parenthesization the oracle uses — one IEEE tree.
    pair
      .withColumn("num", expr(
        "(CAST(sxy AS DOUBLE) - (mu * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)))) + ((CAST(n_pairs AS DOUBLE) * mu) * mu)"))
      .select(col("series"), col("lag"), col("n_pairs"),
        when(col("den") > 0.0, col("num") / col("den")).as("acf"))
  }

  /** The detected seasonal period: per series, the lag in [minLag, maxLag]
    * with the highest autocorrelation (smallest lag on exact float ties —
    * a deterministic total order both engines sort identically). Lag 1 is
    * excluded by default: trend/AR(1) carry-over dominates it on almost
    * any real metric, which is exactly why ACF-based period pickers start
    * at 2.
    */
  def dominantPeriod(events: DataFrame, maxLag: Int = 36, minLag: Int = 2,
      bucketMillis: Long = 3600000L, keyCol: String = "event_type"): DataFrame = {
    val a = acf(events, maxLag, bucketMillis, keyCol)
      .filter(col("lag") >= minLag && col("acf").isNotNull)
    val w = Window.partitionBy("series").orderBy(col("acf").desc, col("lag").asc)
    a.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("series"), col("lag").as("period"), col("acf"))
  }

  /** Per-series mean/sigma from exact moments, as the fixed IEEE tree the
    * scan operators and their oracles share: μ = S/n,
    * σ = sqrt(max(0, S2/n − μ²)).
    */
  private def withMuSigma(series: DataFrame): DataFrame = {
    val stats = series.groupBy("series").agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("s"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("s2"))
      .withColumn("mu", expr("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("sigma", expr(
        "sqrt(greatest(0.0, (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - (mu * mu)))"))
      .select("series", "mu", "sigma")
    series.join(broadcast(stats), "series")
  }

  /** Two-sided CUSUM scan (Page 1954). Against the series' own mean μ and
    * sigma σ (two-pass: the second pass streams), with slack k = kSigma·σ
    * and threshold h = hSigma·σ:
    *
    *   dev  = x − μ
    *   s⁺ₜ = max(0, (s⁺ₜ₋₁ + dev) − k)   alarm_up  when s⁺ₜ > h, then reset to 0
    *   s⁻ₜ = max(0, (s⁻ₜ₋₁ − dev) − k)   alarm_dn  when s⁻ₜ > h, then reset to 0
    *
    * EVERY step is emitted (the full trajectory is the oracle surface,
    * not just the alarms — a wrong non-alarm step fails the gate too).
    * The emitted s⁺/s⁻ are the PRE-reset statistics; the reset applies
    * to the next step's carry. Each step is the same three IEEE ops in
    * the same order as the oracle's recursive CTE, so the doubles match
    * bitwise.
    *
    * Scale: one aggregate for the moments (broadcast back — one row per
    * series), then repartition-by-series + in-partition sort + a single
    * forward mapPartitions pass with O(1) state. Nothing buffers a
    * series.
    *
    * Output: (series, t, bucket, x, s_pos, s_neg, alarm_up, alarm_dn).
    */
  def cusum(events: DataFrame, kSigma: Double = 0.5, hSigma: Double = 4.0,
      bucketMillis: Long = 3600000L, keyCol: String = "event_type"): DataFrame = {
    val joined = withMuSigma(bucketSeries(events, bucketMillis, keyCol))
      .select("series", "t", "bucket", "x", "mu", "sigma")
    val out = StructType(Seq(
      StructField("series", StringType), StructField("t", LongType),
      StructField("bucket", LongType), StructField("x", LongType),
      StructField("s_pos", DoubleType), StructField("s_neg", DoubleType),
      StructField("alarm_up", BooleanType), StructField("alarm_dn", BooleanType)))
    val scanned = joined
      .repartition(col("series"))
      .sortWithinPartitions(col("series"), col("t"))
      .mapPartitions { it =>
        var cur: String = null
        var sp = 0.0
        var sn = 0.0
        it.map { r =>
          val series = r.getString(0)
          if (series != cur) { cur = series; sp = 0.0; sn = 0.0 }
          val x = r.getLong(3); val mu = r.getDouble(4); val sigma = r.getDouble(5)
          val k = kSigma * sigma; val h = hSigma * sigma
          val dev = x.toDouble - mu
          val spNew = math.max(0.0, (sp + dev) - k)
          val snNew = math.max(0.0, (sn - dev) - k)
          val up = spNew > h; val dn = snNew > h
          sp = if (up) 0.0 else spNew
          sn = if (dn) 0.0 else snNew
          Row(series, r.getLong(1), r.getLong(2), x, spNew, snNew, up, dn)
        }
      }(org.apache.spark.sql.Encoders.row(out))
    scanned.toDF()
  }

  /** EWMA smoother: s₁ = x₁, sₜ = sₜ₋₁ + α·(xₜ − sₜ₋₁) — the
    * numerically-stable update form (one multiply, two adds, no (1−α)
    * term), replayed verbatim by the oracle's recursion. Residual is
    * xₜ − sₜ₋₁ (the one-step-ahead forecast error — the quantity a
    * monitor actually thresholds; NULL at t = 1 where there is no
    * forecast). Same secondary-sort scan shape as [[cusum]].
    *
    * Output: (series, t, bucket, x, ewma, resid).
    */
  def ewma(events: DataFrame, alpha: Double = 0.2,
      bucketMillis: Long = 3600000L, keyCol: String = "event_type"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    val series = bucketSeries(events, bucketMillis, keyCol)
    val out = StructType(Seq(
      StructField("series", StringType), StructField("t", LongType),
      StructField("bucket", LongType), StructField("x", LongType),
      StructField("ewma", DoubleType), StructField("resid", DoubleType)))
    series
      .select("series", "t", "bucket", "x")
      .repartition(col("series"))
      .sortWithinPartitions(col("series"), col("t"))
      .mapPartitions { it =>
        var cur: String = null
        var s = 0.0
        var first = true
        it.map { r =>
          val series = r.getString(0)
          if (series != cur) { cur = series; first = true }
          val x = r.getLong(3).toDouble
          val resid = if (first) null else java.lang.Double.valueOf(x - s)
          s = if (first) x else s + alpha * (x - s)
          first = false
          Row(series, r.getLong(1), r.getLong(2), r.getLong(3), s, resid)
        }
      }(org.apache.spark.sql.Encoders.row(out))
      .toDF()
  }

  /** Holt's linear-trend double exponential smoothing in ERROR-CORRECTION
    * form — the next rung above [[ewma]] on the forecasting ladder (a
    * plain EWMA lags any trending series by a constant offset; Holt
    * tracks the slope explicitly, which is exactly the gap between the
    * reference's tail-mean `_fallback_prediction` and its full SARIMAX
    * trend term):
    *
    *   f = l + b          (one-step-ahead forecast)
    *   e = x − f          (forecast error — the emitted residual)
    *   l' = f + α·e       (level update)
    *   b' = b + α·β·e     (trend update)
    *
    * Initialization l₁ = x₁, b₁ = 0, resid NULL at t = 1 (no forecast
    * exists). The error-correction form is chosen over the textbook
    * weighted-average form because each update is a single
    * multiply-and-add over the shared error — three IEEE ops per step in
    * a pinned order, replayed verbatim by the oracle's recursive CTE so
    * the doubles match bitwise. Same secondary-sort O(1)-state scan
    * shape as [[cusum]]/[[ewma]].
    *
    * Output: (series, t, bucket, x, level, trend, resid).
    */
  def holt(events: DataFrame, alpha: Double = 0.2, beta: Double = 0.1,
      bucketMillis: Long = 3600000L, keyCol: String = "event_type"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    require(beta > 0.0 && beta <= 1.0, "beta in (0, 1]")
    val series = bucketSeries(events, bucketMillis, keyCol)
    val out = StructType(Seq(
      StructField("series", StringType), StructField("t", LongType),
      StructField("bucket", LongType), StructField("x", LongType),
      StructField("level", DoubleType), StructField("trend", DoubleType),
      StructField("resid", DoubleType)))
    series
      .select("series", "t", "bucket", "x")
      .repartition(col("series"))
      .sortWithinPartitions(col("series"), col("t"))
      .mapPartitions { it =>
        var cur: String = null
        var l = 0.0
        var b = 0.0
        var first = true
        it.map { r =>
          val series = r.getString(0)
          if (series != cur) { cur = series; first = true }
          val x = r.getLong(3).toDouble
          if (first) {
            l = x; b = 0.0; first = false
            Row(series, r.getLong(1), r.getLong(2), r.getLong(3), l, b, null)
          } else {
            val f = l + b
            val e = x - f
            l = f + alpha * e
            b = b + (alpha * beta) * e
            Row(series, r.getLong(1), r.getLong(2), r.getLong(3), l, b, e)
          }
        }
      }(org.apache.spark.sql.Encoders.row(out))
      .toDF()
  }

  /** Viterbi maximum-a-posteriori regime decoding over a 3-state HMM —
    * the SEQUENCE-level classifier next to the pointwise detectors
    * ([[cusum]] sees shifts, [[mad]]-style rules see outliers; neither
    * assigns each step a latent regime consistent with its NEIGHBORS):
    * observations are the integer band of each bucket value against the
    * series' own exact integer-third thresholds
    * (`t1 = min + (max−min) DIV 3`, `t2 = min + 2·(max−min) DIV 3`),
    * and the decode maximizes the summed integer score
    *
    *   Σₜ E[sₜ][bₜ] + Σₜ T[sₜ₋₁][sₜ]
    *
    * with fixed centi-log-odds tables (stay 0 / adjacent −120 / far
    * −240 transitions; match 0 / adjacent −80 / far −400 emissions) —
    * fixed for the same reason [[Dedup.ErWeights]] fixes its weights:
    * Baum–Welch is float-EM, not oracle-replayable; fixed integer
    * scores keep the whole DP exact. A single-bucket band spike costs
    * less as an emission miss (−80) than as two transitions (−240), so
    * decoded regimes are STICKY — the smoothing a per-sample z-score
    * cannot provide. Ties break toward the smaller state at every
    * argmax (step backpointers and the final state).
    *
    * Scale shape: the [[cusum]] secondary-sort scan, except the decode
    * needs the backpointer matrix for its backward pass, so memory is
    * O(T·K) per series (K = 3) — a series must fit one task's MEMORY,
    * not just stream through it (the [[Suffix]]-style documented bound;
    * cap upstream if a key can outlive millions of buckets). Series
    * count provides the parallelism.
    *
    * Output: (series, t, bucket, x, band, state).
    */
  def viterbi(events: DataFrame, bucketMillis: Long = 3600000L,
      keyCol: String = "event_type"): DataFrame = {
    val series = bucketSeries(events, bucketMillis, keyCol)
    // DIV (floor on the non-negative span), never `/` (double division)
    val th = series.groupBy("series").agg(
      expr("min(x) + (max(x) - min(x)) DIV 3").as("t1"),
      expr("min(x) + (2 * (max(x) - min(x))) DIV 3").as("t2"))
    val banded = series.join(th, "series")
      .select(col("series"), col("t"), col("bucket"), col("x"),
        when(col("x") < col("t1"), 0L).when(col("x") < col("t2"), 1L)
          .otherwise(2L).as("band"))
    val out = StructType(Seq(
      StructField("series", StringType), StructField("t", LongType),
      StructField("bucket", LongType), StructField("x", LongType),
      StructField("band", LongType), StructField("state", LongType)))
    banded
      .repartition(col("series"))
      .sortWithinPartitions(col("series"), col("t"))
      .mapPartitions { it =>
        val bit = it.buffered
        new Iterator[Seq[Row]] {
          def hasNext: Boolean = bit.hasNext
          def next(): Seq[Row] = {
            val s = bit.head.getString(0)
            val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
            while (bit.hasNext && bit.head.getString(0) == s) buf += bit.next()
            decodeSeries(buf)
          }
        }.flatten
      }(org.apache.spark.sql.Encoders.row(out))
      .toDF()
  }

  private def emit(s: Int, b: Int): Long =
    math.abs(s - b) match { case 0 => 0L; case 1 => -80L; case _ => -400L }
  private def trans(s: Int, sp: Int): Long =
    math.abs(s - sp) match { case 0 => 0L; case 1 => -120L; case _ => -240L }

  /** Forward DP + backtrace over one series' buffered, t-ordered rows
    * (series, t, bucket, x, band). Argmax ties -> smallest state,
    * mirrored exactly by the oracle's CASE ladders.
    */
  private def decodeSeries(rows: scala.collection.Seq[Row]): Seq[Row] = {
    val n = rows.length
    val bands = Array.tabulate(n)(i => rows(i).getLong(4).toInt)
    val dp = Array.tabulate(3)(s => emit(s, bands(0)))
    val bp = Array.ofDim[Int](n, 3)
    var t = 1
    while (t < n) {
      val nd = new Array[Long](3)
      var sp = 0
      while (sp < 3) {
        var best = Long.MinValue
        var arg = 0
        var s = 0
        while (s < 3) {
          val c = dp(s) + trans(s, sp)
          if (c > best) { best = c; arg = s } // strict: first max wins = smallest
          s += 1
        }
        nd(sp) = best + emit(sp, bands(t))
        bp(t)(sp) = arg
        sp += 1
      }
      System.arraycopy(nd, 0, dp, 0, 3)
      t += 1
    }
    val path = new Array[Int](n)
    path(n - 1) =
      if (dp(0) >= dp(1) && dp(0) >= dp(2)) 0 else if (dp(1) >= dp(2)) 1 else 2
    t = n - 1
    while (t > 0) { path(t - 1) = bp(t)(path(t)); t -= 1 }
    (0 until n).map { i =>
      val r = rows(i)
      Row(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), path(i).toLong)
    }
  }

  /** Regular-grid gap fill with linear interpolation — the resampling
    * step every downstream window model assumes ([[acf]]'s lag-k
    * alignment and the SARIMAX season index are only meaningful on an
    * equally-spaced series; a missing hour silently shifts every lag
    * after it). Emits ONE row per (series, bucket) for every bucket in
    * the series' observed span `[min bucket, max bucket]`:
    *
    *   - present buckets: the exact cents sum, `filled = false`;
    *   - gap buckets: linear interpolation between the nearest present
    *     neighbors, `filled = true` —
    *       v = pv + ((nv − pv) · (b − pb)) / (nb − pb)
    *     over exact BIGINT cents/buckets, ONE fixed IEEE tree (the
    *     module-header bitwise convention; span edges are present by
    *     construction, so both neighbors always exist).
    *
    * Scale shape: the bucket roll-up shuffle, one span aggregate +
    * `sequence()` explode (one row per grid slot — bounded by span, not
    * events), a (series, bucket) merge join, and two per-series windows
    * (prev/next present observation) sharing ONE sort — nothing global,
    * nothing quadratic. A pathologically sparse key (two events a year
    * apart at minute buckets) explodes its OWN span only; cap spans
    * upstream if the corpus allows sensor keys that outlive their data.
    */
  def gapFill(events: DataFrame, bucketMillis: Long = 3600000L,
      keyCol: String = "event_type"): DataFrame = {
    val present = bucketSeries(events, bucketMillis, keyCol).drop("t")
    val grid = present.groupBy("series")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col("series"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val joined = grid.join(present, Seq("series", "bucket"), "left")
    val ord = Window.partitionBy("series").orderBy("bucket")
    val back = ord.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = ord.rowsBetween(1, Window.unboundedFollowing)
    val pb = last(when(col("x").isNotNull, col("bucket")), ignoreNulls = true).over(back)
    val pv = last(col("x"), ignoreNulls = true).over(back)
    val nb = first(when(col("x").isNotNull, col("bucket")), ignoreNulls = true).over(fwd)
    val nv = first(col("x"), ignoreNulls = true).over(fwd)
    joined
      .withColumn("__pb", pb).withColumn("__pv", pv)
      .withColumn("__nb", nb).withColumn("__nv", nv)
      .select(col("series"), col("bucket"),
        when(col("x").isNotNull, col("x").cast("double"))
          .otherwise(col("__pv").cast("double") +
            ((col("__nv") - col("__pv")).cast("double") *
              (col("bucket") - col("__pb")).cast("double")) /
              (col("__nb") - col("__pb")).cast("double"))
          .as("value_cents"),
        col("x").isNull.as("filled"))
  }
}
