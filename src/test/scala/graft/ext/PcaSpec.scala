package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def vecDf(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** 300 vectors in 8 dims: dominant variance along u1 = (1,1,0,...)/√2,
    * secondary along u2 = (1,-1,0,...)/√2, small isotropic noise.
    */
  private lazy val planted: DataFrame = {
    val rng = new scala.util.Random(7)
    val s = math.sqrt(2) / 2
    val rows = (0L until 300L).map { i =>
      val a = rng.nextGaussian() * 3.0 // pc1 coordinate
      val b = rng.nextGaussian() * 1.5 // pc2 coordinate
      val v = Array.fill(8)(rng.nextGaussian() * 0.05)
      v(0) += (a + b) * s
      v(1) += (a - b) * s
      (i, v.map(_.toFloat).toSeq)
    }
    vecDf(rows)
  }

  test("featureStats: known per-dimension stats on a tiny frame") {
    val df = vecDf(Seq(
      1L -> Seq(1f, 10f),
      2L -> Seq(3f, 10f),
      3L -> Seq(5f, 10f)))
    val out = Features.featureStats(df).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out(0) == ((3L, 3.0, 2.0, 1.0, 5.0)))
    assert(out(1) == ((3L, 10.0, 0.0, 10.0, 10.0))) // zero variance -> std 0
  }

  test("featureStats: ragged vectors yield per-dimension counts; null vectors excluded") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(Seq(1f, 2f))),
      (Some(2L), Some(Seq(3f))),
      (Some(3L), None)).toDF("vec_id", "embedding")
    val out = Features.featureStats(df).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(0 -> 2L, 1 -> 1L))
    // single observation in dim 1 -> NULL std (n = 1 guard)
    val stdByDim = Features.featureStats(df).collect().map(r => r.getInt(0) -> r.isNullAt(3)).toMap
    assert(stdByDim(1))
  }

  test("featureStats: null vector COMPONENTS don't bias mean/std (n counts summed values only)") {
    import spark.implicits._
    // dim 0 sees values 2 and 4 plus one null component: mean must be 3
    // (2 values), not 2 (3 "values" where null inflated n while the sum
    // skipped it — the round-6 advice defect)
    val df = Seq(
      (Some(1L), Some(Seq(Some(2f), Some(7f)))),
      (Some(2L), Some(Seq(Some(4f), Some(7f)))),
      (Some(3L), Some(Seq(Option.empty[Float], Some(7f))))).toDF("vec_id", "embedding")
    val out = Features.featureStats(df).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(0) == ((2L, 3.0)), s"null component biased dim 0: ${out(0)}")
    assert(out(1) == ((3L, 7.0)))
  }

  test("covariance matches a direct two-pass computation on a small frame") {
    val rng = new scala.util.Random(11)
    val data = (0L until 50L).map(i => (i, Seq.fill(4)(rng.nextGaussian().toFloat)))
    val cov = Features.covariance(vecDf(data), dim = 4)
    // reference: naive centered covariance in full precision
    val xs = data.map(_._2.map(_.toDouble).toArray)
    val n = xs.length
    val mean = (0 until 4).map(j => xs.map(_(j)).sum / n)
    for (i <- 0 until 4; j <- 0 until 4) {
      val ref = xs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
      assert(math.abs(cov(i)(j) - ref) < 1e-9, s"cov($i)($j) ${cov(i)(j)} vs $ref")
      assert(cov(i)(j) == cov(j)(i))
    }
  }

  test("power iteration recovers planted directions, ordered and orthogonal") {
    val cov = Features.covariance(planted, dim = 8)
    val (comps, eigs) = Features.topComponents(cov, k = 2)
    val s = math.sqrt(2) / 2
    val u1 = Array(s, s) ++ Array.fill(6)(0.0)
    val u2 = Array(s, -s) ++ Array.fill(6)(0.0)
    def absCos(a: Array[Double], b: Array[Double]): Double =
      math.abs(a.zip(b).map { case (x, y) => x * y }.sum) /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(absCos(comps(0), u1) > 0.995, s"pc1 ${comps(0).toSeq}")
    assert(absCos(comps(1), u2) > 0.995, s"pc2 ${comps(1).toSeq}")
    assert(eigs(0) > eigs(1) && eigs(1) > 0)
    // eigenvalues near the planted variances (3^2 = 9, 1.5^2 = 2.25)
    assert(math.abs(eigs(0) - 9.0) < 2.0 && math.abs(eigs(1) - 2.25) < 0.8, eigs.toSeq.toString)
    assert(math.abs(comps(0).zip(comps(1)).map { case (x, y) => x * y }.sum) < 1e-6)
  }

  test("pcaProject: long-form output whose per-component variance matches the eigenvalues") {
    val out = Features.pcaProject(planted, k = 2, dim = 8)
    assert(out.columns.toSeq == Seq("vec_id", "component", "value"))
    val byComp = out.collect().map(r => (r.getInt(1), r.getDouble(2))).groupBy(_._1)
    assert(byComp.keySet == Set(0, 1))
    val cov = Features.covariance(planted, dim = 8)
    val (_, eigs) = Features.topComponents(cov, k = 2)
    for (c <- 0 to 1) {
      val vals = byComp(c).map(_._2)
      val m = vals.sum / vals.length
      val v = vals.map(x => (x - m) * (x - m)).sum / (vals.length - 1)
      assert(math.abs(v - eigs(c)) / eigs(c) < 1e-6, s"component $c variance $v vs ${eigs(c)}")
    }
  }

  test("pcaProject excludes vectors shorter than dim and is repeatable") {
    import spark.implicits._
    val withShort = planted.union(
      Seq((999L, Seq(1f, 2f))).toDF("vec_id", "embedding"))
    val out = Features.pcaProject(withShort, k = 1, dim = 8)
    assert(out.filter(col("vec_id") === 999L).count() == 0)
    val a = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    val b = Features.pcaProject(withShort, k = 1, dim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(a.toSeq == b.toSeq)
  }

  test("featureDrift: planted mean shift flags its dimension and only it") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val base = (0L until 200L).map(i => (i, Seq.fill(4)(rng.nextGaussian().toFloat)))
    val oldDf = base.toDF("vec_id", "embedding")
    // new snapshot: +2.0 on dim 1, other dims re-sampled from the same dist
    val newDf = base.map { case (i, v) =>
      (i, v.zipWithIndex.map { case (x, j) => if (j == 1) x + 2.0f else x })
    }.toDF("vec_id", "embedding")
    val out = Features.featureDrift(oldDf, newDf).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(7), Option(r.get(8)).map(_.asInstanceOf[Double])))).toMap
    assert(out.size == 4)
    assert(math.abs(out(1)._1 - 2.0) < 0.01, s"planted shift: ${out(1)}")
    assert(out(1)._2.get > 10, s"dim 1 must flag hard: ${out(1)._2}")
    Seq(0, 2, 3).foreach { d =>
      assert(math.abs(out(d)._2.get) < 4, s"dim $d must not flag: ${out(d)._2}")
    }
  }

  test("featureDrift: single-observation sides yield NULL z, not a crash") {
    import spark.implicits._
    val oldDf = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val newDf = Seq((1L, Seq(3f, 4f)), (2L, Seq(5f, 6f))).toDF("vec_id", "embedding")
    val out = Features.featureDrift(oldDf, newDf).collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.isNullAt(8), "n=1 old side cannot estimate a variance"))
  }

  test("covariance requires at least two full-length observations") {
    intercept[IllegalArgumentException] {
      Features.covariance(vecDf(Seq(1L -> Seq(1f, 2f))), dim = 2)
    }
  }
}
