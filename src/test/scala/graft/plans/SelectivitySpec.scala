package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SelectivitySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def df(vals: Seq[Double]) = {
    import spark.implicits._
    vals.toDF("v")
  }

  test("full-bucket probes are exact; interpolated probes stay in the bucket's range") {
    // three value clusters -> v-opt puts boundaries between them
    val vals = Seq.fill(100)(1.0) ++ Seq.fill(100)(2.0) ++
      Seq.fill(50)(10.0) ++ Seq.fill(50)(11.0) ++ Seq.fill(10)(20.0) ++ Seq.fill(10)(21.0)
    val got = Selectivity.estimate(df(vals), "v", probes = Seq(250L, 1150L, 2200L), buckets = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 250 cents = 2.5: everything <= 2.5 is the first cluster pair = 200 rows
    assert(got(250L)._2 == 200L, "exact is ground truth")
    // the full corpus <= 22: every row
    assert(got(2200L)._2 == 320L)
    got.values.foreach { case (est, exact, err) =>
      assert(err == est - exact, "err column is the identity")
      assert(est >= 0 && est <= 320)
    }
    // a probe covering whole buckets exactly reproduces the exact count
    assert(got(2200L)._1 == 320L, "all-buckets-full probe is exact by construction")
  }

  test("uniform interpolation inside one bucket follows the pinned floor formula") {
    // one flat bucket 1..4 (cents 100..400), all f = 10 -> with B=1
    val vals = (1 to 4).flatMap(v => Seq.fill(10)(v.toDouble))
    val got = Selectivity.estimate(df(vals), "v", probes = Seq(250L), buckets = 1)
      .collect().head
    // est = floor(40 * (250 - 100 + 1) / (400 - 100 + 1)) = floor(40*151/301)
    assert(got.getLong(1) == 40L * 151L / 301L)
    assert(got.getLong(2) == 20L)
  }

  test("the histogram adapts to skew: clustered mass beats equi-width errors") {
    val rnd = new scala.util.Random(71)
    // heavy spike at 1.0 plus a thin uniform tail
    val vals = Seq.fill(1000)(1.0) ++ (1 to 100).map(_ => 10.0 + rnd.nextInt(40))
    val got = Selectivity.estimate(df(vals), "v", probes = Seq(150L), buckets = 4)
      .collect().head
    // the spike gets its own bucket, so a probe just past it is near-exact
    assert(math.abs(got.getLong(3)) <= 20L,
      s"estimate ${got.getLong(1)} should be near exact ${got.getLong(2)}")
  }

  test("maxDistinct caps the DP input while exact counts stay uncapped") {
    val vals = (1 to 100).map(_.toDouble)
    val got = Selectivity.estimate(df(vals), "v", probes = Seq(9000L),
      buckets = 2, maxDistinct = 10)
    val r = got.collect().head
    assert(r.getLong(2) == 90L, "exact sees all 100 values")
    // the histogram only saw values 1..10 (cents <= 1000): everything above
    // its top bound is estimated as the full histogram mass
    assert(r.getLong(1) == 10L, "capped histogram holds 10 rows of mass")
  }
}
