package graft.ts

/** Small deterministic Nelder–Mead simplex minimizer (standard coefficients
  * alpha=1, gamma=2, rho=0.5, sigma=0.5). Used for the conditional
  * sum-of-squares fit in [[SarimaxLite]]; dimensionality there is tiny
  * (p+q+P+Q, default 3), so simplex search is robust and fast.
  */
object NelderMead {

  def minimize(
      f: Array[Double] => Double,
      x0: Array[Double],
      step: Double = 0.25,
      maxIter: Int = 400,
      tol: Double = 1e-10): Array[Double] = {
    val n = x0.length
    if (n == 0) return x0
    // initial simplex: x0 plus one vertex per axis
    var simplex: Array[(Array[Double], Double)] = (0 to n).map { i =>
      val v = x0.clone()
      if (i > 0) v(i - 1) += step
      (v, f(v))
    }.toArray

    var iter = 0
    while (iter < maxIter) {
      simplex = simplex.sortBy(_._2)
      val best = simplex(0)._2
      val worst = simplex(n)._2
      if (math.abs(worst - best) <= tol * (math.abs(best) + tol)) {
        iter = maxIter // converged
      } else {
        val centroid = new Array[Double](n)
        var i = 0
        while (i < n) { // centroid of all but worst
          var j = 0
          var s = 0.0
          while (j < n) { s += simplex(j)._1(i); j += 1 }
          centroid(i) = s / n
          i += 1
        }
        def combine(a: Array[Double], b: Array[Double], t: Double): Array[Double] = {
          val out = new Array[Double](n)
          var k = 0
          while (k < n) { out(k) = a(k) + t * (b(k) - a(k)); k += 1 }
          out
        }
        val xw = simplex(n)._1
        val xr = combine(centroid, xw, -1.0) // reflection
        val fr = f(xr)
        if (fr < simplex(0)._2) {
          val xe = combine(centroid, xw, -2.0) // expansion
          val fe = f(xe)
          simplex(n) = if (fe < fr) (xe, fe) else (xr, fr)
        } else if (fr < simplex(n - 1)._2) {
          simplex(n) = (xr, fr)
        } else {
          val xc = combine(centroid, xw, 0.5) // contraction
          val fc = f(xc)
          if (fc < simplex(n)._2) {
            simplex(n) = (xc, fc)
          } else { // shrink toward best
            val xb = simplex(0)._1
            var j = 1
            while (j <= n) {
              val xs = combine(xb, simplex(j)._1, 0.5)
              simplex(j) = (xs, f(xs))
              j += 1
            }
          }
        }
        iter += 1
      }
    }
    simplex.minBy(_._2)._1
  }
}
