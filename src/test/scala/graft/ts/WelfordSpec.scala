package graft.ts

import org.scalatest.funsuite.AnyFunSuite

/** Welford accumulator properties vs the reference running-stats semantics
  * (/root/reference/src/flinkarima.py:192-216). Property-style checks run
  * over seeded random inputs (deterministic, no external generators).
  */
class WelfordSpec extends AnyFunSuite {

  private def randomSeries(seed: Long, n: Int): Seq[Double] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(rng.nextDouble() * 2e6 - 1e6)
  }

  test("mean matches two-pass mean; m2 non-negative (100 seeded cases)") {
    for (seed <- 0 until 100) {
      val xs = randomSeries(seed, seed % 37 + 1)
      val w = Welford.of(xs)
      assert(w.count == xs.length)
      val mean = xs.sum / xs.length
      assert(math.abs(w.mean - mean) <= 1e-9 * (1 + math.abs(mean)), s"seed=$seed")
      assert(w.m2 >= -1e-9, s"seed=$seed")
    }
  }

  test("std matches two-pass sample standard deviation") {
    for (seed <- 0 until 100) {
      val xs = randomSeries(seed + 1000, seed % 50 + 2)
      val w = Welford.of(xs)
      val mean = xs.sum / xs.length
      val twoPass = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1))
      assert(math.abs(w.std - twoPass) <= 1e-6 * (1 + twoPass), s"seed=$seed")
    }
  }

  test("mean is permutation-invariant (within FP tolerance)") {
    for (seed <- 0 until 50) {
      val xs = randomSeries(seed + 2000, 64)
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val a = Welford.of(xs)
      val b = Welford.of(shuffled)
      assert(math.abs(a.mean - b.mean) <= 1e-8 * (1 + math.abs(a.mean)), s"seed=$seed")
    }
  }

  test("std guards: count <= 1 or m2 == 0 -> 0.0 (flinkarima.py:196)") {
    assert(Welford.empty.std == 0.0)
    assert(Welford.empty.add(5.0).std == 0.0)
    // identical samples: m2 stays 0 -> std 0
    assert(Welford.of(Seq.fill(10)(3.14)).std == 0.0)
  }

  test("zscore uses current stats and guards std == 0 (flinkarima.py:197-198)") {
    val w = Welford.of(Seq(1.0, 2.0, 3.0))
    assert(w.zscore(2.0) == 0.0) // x == mean
    assert(w.zscore(3.0) == (3.0 - 2.0) / w.std)
    assert(Welford.empty.zscore(42.0) == 0.0)
  }
}
