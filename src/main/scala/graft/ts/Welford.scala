package graft.ts

/** Welford online mean/variance accumulator — exact port of the running-stats
  * update in /root/reference/src/flinkarima.py:192-216.
  *
  * Semantics preserved:
  *  - `std` is the SAMPLE standard deviation sqrt(m2/(count-1)), guarded by
  *    `count > 1 && m2 > 0` (flinkarima.py:196, :228-230 recompute).
  *  - normalization uses the stats BEFORE adding the current sample
  *    (flinkarima.py:197-198 happen before :209-216).
  */
final case class Welford(count: Long, mean: Double, m2: Double) {

  def std: Double =
    if (count > 1 && m2 > 0) math.sqrt(m2 / (count - 1)) else 0.0

  /** z-score of `x` under the current stats; 0.0 when std == 0 (flinkarima.py:198). */
  def zscore(x: Double): Double = {
    val s = std
    if (s > 0) (x - mean) / s else 0.0
  }

  def add(x: Double): Welford = {
    val n = count + 1
    val delta = x - mean
    val newMean = mean + delta / n
    val delta2 = x - newMean
    Welford(n, newMean, m2 + delta * delta2)
  }
}

object Welford {
  val empty: Welford = Welford(0L, 0.0, 0.0)

  def of(xs: Iterable[Double]): Welford = xs.foldLeft(empty)(_.add(_))
}
