package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def vecDf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("codes stay in [-127, 127]; reconstruction error bounded by the step size") {
    val rng = new scala.util.Random(3)
    val df = vecDf((0L until 50L).map(i => (i, Seq.fill(16)(rng.nextGaussian().toFloat * 5f))))
    val rows = Quantization.scalarQuantize(df).collect()
    rows.foreach { r =>
      val scale = r.getDouble(2)
      val q = r.getSeq[Int](3)
      assert(q.forall(v => v >= -127 && v <= 127), q)
      assert(scale > 0)
    }
    // floor quantization: |x - x̂| < scale/127 per element
    val stats = Quantization.quantizationStats(df).collect()
    stats.foreach { r =>
      val (scale, err) = (r.getDouble(1), r.getDouble(3))
      val bound = 16 * math.pow(scale / 127, 2)
      assert(err >= 0 && err <= bound, s"err $err vs bound $bound")
    }
  }

  test("zero vector quantizes to all-zero codes with scale 0 and zero error") {
    val df = vecDf(Seq(1L -> Seq.fill(8)(0f)))
    val r = Quantization.quantizationStats(df).collect().head
    assert(r.getDouble(1) == 0.0)
    assert(r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0)
  }

  test("quantization is deterministic and the max-|x| element hits full scale") {
    val df = vecDf(Seq(1L -> Seq(1f, -2f, 0.5f)))
    val r = Quantization.scalarQuantize(df).collect().head
    assert(r.getDouble(2) == 2.0) // scale = max |x|
    val q = r.getSeq[Int](3)
    // x = -2: -2/2*127 = -127 exactly; x = 1: 63.5 -> floor 63; x = 0.5: 31.75 -> 31
    assert(q == Seq(63, -127, 31), q)
  }

  test("product quantization: exact reconstruction when the codebook covers every subvector") {
    // vectors assembled from 3 distinct subvector values per subspace: with
    // codebookSize >= 3 every subvector is its own (or a duplicate) centroid
    val parts = Seq(Seq(1f, 0f), Seq(0f, 2f), Seq(-1f, -1f))
    val df = vecDf((0L until 27L).map { i =>
      (i, parts((i % 3).toInt) ++ parts(((i / 3) % 3).toInt))
    })
    val rows = Quantization.productQuantize(df, dim = 4, m = 2, codebookSize = 8).collect()
    assert(rows.length == 27)
    rows.foreach { r =>
      val code = r.getSeq[Int](1)
      assert(code.length == 2 && code.forall(c => c >= 0 && c < 8), code)
      assert(r.getDouble(2) < 1e-24, s"recon err ${r.getDouble(2)}")
    }
    // identical vectors get identical codes
    val byVec = rows.groupBy(_.getLong(0) % 9).values
    byVec.foreach(g => assert(g.map(_.getSeq[Int](1)).distinct.length == 1))
  }

  test("product quantization: deterministic under repartitioning; exclusions and guards") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val base = (0L until 60L).map(i => (i, Seq.fill(8)(rng.nextGaussian().toFloat)))
    val withBad = base ++ Seq((999L, Seq(1f, 2f))) // too short -> excluded
    val df = withBad.toDF("vec_id", "embedding")
    val a = Quantization.productQuantize(df, dim = 8, m = 4, codebookSize = 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).sortBy(_._1)
    val b = Quantization.productQuantize(df.repartition(11), dim = 8, m = 4, codebookSize = 4)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "hash-ordered sample + strict argmin must be partition-invariant")
    assert(!a.exists(_._1 == 999L), "short vectors are excluded")
    intercept[IllegalArgumentException](
      Quantization.productQuantize(df, dim = 8, m = 3))
  }

  test("product quantization: more subspaces cannot increase total reconstruction error") {
    val rng = new scala.util.Random(23)
    val df = vecDf((0L until 80L).map(i => (i, Seq.fill(8)(rng.nextGaussian().toFloat))))
    def totalErr(m: Int): Double =
      Quantization.productQuantize(df, dim = 8, m = m, codebookSize = 4)
        .collect().map(_.getDouble(2)).sum
    // finer partitioning (same per-subspace budget) fits at least as well:
    // each subspace optimizes independently over fewer dimensions
    assert(totalErr(4) <= totalErr(2) + 1e-9, s"m=4 ${totalErr(4)} vs m=2 ${totalErr(2)}")
  }
}
