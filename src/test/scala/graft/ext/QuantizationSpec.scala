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
}
