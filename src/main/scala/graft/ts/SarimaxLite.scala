package graft.ts

import scala.collection.mutable.ArrayBuffer

/** SARIMA((p,d,q) x (P,D,Q,s)) forecaster scoped to what the reference job
  * exercises (/root/reference/src/flinkarima.py:226-239: defaults (1,1,1) x
  * (0,1,1,288), `enforce_stationarity=False`, `enforce_invertibility=False`,
  * 1-step forecast).
  *
  * Method: apply d regular + D seasonal differences, fit the multiplicative
  * ARMA polynomial by conditional-sum-of-squares (zero-padded pre-sample, the
  * classic CSS anchoring) minimized with deterministic Nelder–Mead, forecast,
  * then integrate the differences back. Exact statsmodels equality is not a
  * goal (the pipeline only thresholds deviations, SURVEY §7.4); goldens are
  * tolerance-based.
  *
  * Fallback ladder (documented divergence, SURVEY §7.4.1): when the
  * differenced series is too short for a meaningful CSS fit — which happens at
  * the reference defaults, where min_history (288) == s and the seasonally
  * differenced series is empty — we fall back to a seasonal-naive forecast
  * (value one season ago), then to the series mean. statsmodels can still
  * produce (diffuse-prior) output there; both degrade to "recent seasonal
  * level" in practice.
  */
object SarimaxLite {

  final case class Spec(p: Int, d: Int, q: Int, bigP: Int, bigD: Int, bigQ: Int, s: Int)

  object Spec {
    val default: Spec = Spec(1, 1, 1, 0, 1, 1, 288)
  }

  private def diff(x: Array[Double], lag: Int): Array[Double] =
    if (x.length <= lag) Array.empty
    else Array.tabulate(x.length - lag)(i => x(i + lag) - x(i))

  /** Multiply lag polynomials represented as Map(lag -> coefficient), lag 0 = 1. */
  private def polyMul(a: Map[Int, Double], b: Map[Int, Double]): Map[Int, Double] = {
    val out = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(0.0)
    for ((la, ca) <- a; (lb, cb) <- b) out(la + lb) += ca * cb
    out.toMap
  }

  /** phi(B) = 1 - sum phi_i B^(i*step) */
  private def arPoly(params: Array[Double], step: Int): Map[Int, Double] =
    Map(0 -> 1.0) ++ params.zipWithIndex.map { case (c, i) => ((i + 1) * step, -c) }

  /** theta(B) = 1 + sum theta_j B^(j*step) */
  private def maPoly(params: Array[Double], step: Int): Map[Int, Double] =
    Map(0 -> 1.0) ++ params.zipWithIndex.map { case (c, i) => ((i + 1) * step, c) }

  /** Combined AR weights a_l (w_t = sum a_l w_(t-l) + ...) and MA weights m_l
    * (... + sum m_l e_(t-l) + e_t) from the multiplicative polynomials.
    */
  private def weights(spec: Spec, params: Array[Double]): (Array[(Int, Double)], Array[(Int, Double)]) = {
    val phi = params.slice(0, spec.p)
    val theta = params.slice(spec.p, spec.p + spec.q)
    val sphi = params.slice(spec.p + spec.q, spec.p + spec.q + spec.bigP)
    val stheta = params.slice(spec.p + spec.q + spec.bigP, spec.p + spec.q + spec.bigP + spec.bigQ)
    val ar = polyMul(arPoly(phi, 1), arPoly(sphi, spec.s))
    val ma = polyMul(maPoly(theta, 1), maPoly(stheta, spec.s))
    val arW = ar.collect { case (l, c) if l > 0 => (l, -c) }.toArray.sortBy(_._1)
    val maW = ma.collect { case (l, c) if l > 0 => (l, c) }.toArray.sortBy(_._1)
    (arW, maW)
  }

  /** Conditional-sum-of-squares residuals with zero pre-sample padding. */
  private def residuals(w: Array[Double], arW: Array[(Int, Double)], maW: Array[(Int, Double)]): Array[Double] = {
    val n = w.length
    val e = new Array[Double](n)
    var t = 0
    while (t < n) {
      var pred = 0.0
      var i = 0
      while (i < arW.length) {
        val l = arW(i)._1
        if (t - l >= 0) pred += arW(i)._2 * w(t - l)
        i += 1
      }
      i = 0
      while (i < maW.length) {
        val l = maW(i)._1
        if (t - l >= 0) pred += maW(i)._2 * e(t - l)
        i += 1
      }
      e(t) = w(t) - pred
      t += 1
    }
    e
  }

  /** CSS fit of the ARMA parameters on an already-differenced series —
    * exposed for validation (parameter-recovery tests); [[forecast]] is the
    * production entry. Returns (phi..., theta..., sphi..., stheta...) in
    * spec order.
    */
  def fitCss(w: Array[Double], spec: Spec): Array[Double] = {
    val nParams = spec.p + spec.q + spec.bigP + spec.bigQ
    require(nParams > 0, "spec has no ARMA parameters to fit")
    NelderMead.minimize(css(w, spec), Array.fill(nParams)(0.1))
  }

  private def css(w: Array[Double], spec: Spec)(params: Array[Double]): Double = {
    val (arW, maW) = weights(spec, params)
    val e = residuals(w, arW, maW)
    var s = 0.0
    var i = 0
    while (i < e.length) { s += e(i) * e(i); i += 1 }
    if (s.isNaN || s.isInfinite) Double.MaxValue else s
  }

  /** Forecast `steps` ahead; returns the LAST forecast step (the reference
    * takes `forecast(steps)[-1]`, flinkarima.py:235). None only on empty input.
    */
  def forecast(series: Array[Double], spec: Spec, steps: Int = 1): Option[Double] = {
    if (series.isEmpty || steps < 1) return None

    // differencing stages; head of `stages` = last difference applied
    var stages: List[(ArrayBuffer[Double], Int)] = Nil
    var cur = series
    for (_ <- 0 until spec.d) {
      stages = (ArrayBuffer.from(cur), 1) :: stages
      cur = diff(cur, 1)
    }
    for (_ <- 0 until spec.bigD) {
      stages = (ArrayBuffer.from(cur), spec.s) :: stages
      cur = diff(cur, spec.s)
    }
    val w = cur

    val maxArLag = spec.p + spec.s * spec.bigP
    val maxMaLag = spec.q + spec.s * spec.bigQ
    val required = maxArLag + maxMaLag + 5
    val nParams = spec.p + spec.q + spec.bigP + spec.bigQ

    val wPreds: ArrayBuffer[Double] =
      if (w.length >= required && nParams > 0 && w.exists(_ != w.head)) {
        val best = NelderMead.minimize(css(w, spec), Array.fill(nParams)(0.1))
        val (arW, maW) = weights(spec, best)
        val wBuf = ArrayBuffer.from(w)
        val eBuf = ArrayBuffer.from(residuals(w, arW, maW))
        val preds = ArrayBuffer.empty[Double]
        for (_ <- 0 until steps) {
          val t = wBuf.length
          var pred = 0.0
          for ((l, c) <- arW) if (t - l >= 0) pred += c * wBuf(t - l)
          for ((l, c) <- maW) if (t - l >= 0) pred += c * eBuf(t - l)
          wBuf += pred
          eBuf += 0.0 // future shocks are zero in expectation
          preds += pred
        }
        preds
      } else if (w.nonEmpty) {
        // degenerate/short differenced series: flat continuation at zero change
        // is the seasonal-naive forecast once integrated back
        ArrayBuffer.fill(steps)(if (w.forall(_ == w.head)) w.head else 0.0)
      } else {
        ArrayBuffer.fill(steps)(0.0)
      }

    // integrate back through the differencing stages (reverse order)
    var preds = wPreds
    for ((ser, lag) <- stages) {
      val s2 = ser.clone()
      val out = ArrayBuffer.empty[Double]
      for (p <- preds) {
        if (s2.length - lag < 0) return Some(seasonalNaive(series, spec, steps))
        val v = p + s2(s2.length - lag)
        s2 += v
        out += v
      }
      preds = out
    }
    Some(preds.last)
  }

  /** Seasonal-naive: value one season back, else series mean. */
  private def seasonalNaive(x: Array[Double], spec: Spec, steps: Int): Double = {
    val s = math.max(1, spec.s)
    val idx = x.length - s + ((steps - 1) % s)
    if (idx >= 0 && idx < x.length) x(idx) else x.sum / x.length
  }
}
