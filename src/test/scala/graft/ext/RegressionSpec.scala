package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RegressionSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def df(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("g", "x", "y")
  }

  private def fit(rows: Seq[(String, Long, Long)]) =
    Regression.groupedOls(df(rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap

  test("an exact line recovers slope, intercept, and R^2 = 1 exactly") {
    val got = fit((1L to 10L).map(x => ("a", x, 3 * x + 2)))
    // all moments are small integers: the IEEE tree is exact end to end
    assert(got("a") == ((10L, Some(3.0), Some(2.0), Some(1.0))))
  }

  test("constant x is a degenerate fit: NULL slope/intercept/R^2") {
    val got = fit(Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 5L, 3L)))
    assert(got("a") == ((3L, None, None, None)))
  }

  test("constant y fits a flat line with NULL R^2") {
    val got = fit(Seq(("a", 1L, 7L), ("a", 2L, 7L), ("a", 3L, 7L)))
    assert(got("a") == ((3L, Some(0.0), Some(7.0), None)))
  }

  test("matches the mean-centered textbook formulas on noisy data") {
    val rows = (1 to 100).map { i =>
      val x = (i * 37) % 101
      val y = 5 * x + 17 + ((i * 13) % 7) - 3
      ("a", x.toLong, y.toLong)
    }
    val xs = rows.map(_._2.toDouble); val ys = rows.map(_._3.toDouble)
    val n = xs.size
    val mx = xs.sum / n; val my = ys.sum / n
    val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sxx = xs.map(x => (x - mx) * (x - mx)).sum
    val syy = ys.map(y => (y - my) * (y - my)).sum
    val got = fit(rows)("a")
    assert(math.abs(got._2.get - sxy / sxx) < 1e-9)
    assert(math.abs(got._3.get - (my - sxy / sxx * mx)) < 1e-9)
    assert(math.abs(got._4.get - (sxy * sxy) / (sxx * syy)) < 1e-9)
  }

  test("exact under any partitioning (decimal moments, fixed IEEE tree)") {
    val rows = (1 to 500).map(i => (s"g${i % 3}", ((i * 7) % 83).toLong, ((i * 11) % 97).toLong))
    def run(parts: Int) = Regression.groupedOls(df(rows).repartition(parts))
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1).toSeq
    assert(run(1) == run(13) && run(13) == run(32))
  }

  test("null group/x/y rows are dropped, not zero-filled") {
    import spark.implicits._
    val rows = Seq(
      (Some("a"), Some(1L), Some(3L)), (Some("a"), Some(2L), Some(5L)),
      (Some("a"), Some(3L), Some(7L)),
      (None, Some(4L), Some(9L)), (Some("a"), None, Some(9L)), (Some("a"), Some(4L), None))
      .toDF("g", "x", "y")
    val got = Regression.groupedOls(rows).collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L && got(0).getDouble(2) == 2.0)
  }
}
