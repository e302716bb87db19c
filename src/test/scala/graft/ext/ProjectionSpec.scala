package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def vecs(n: Int, d: Int): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(7)
    (1 to n).map(i => (i.toLong, Seq.fill(d)(rng.nextFloat() * 2 - 1)))
  }

  test("projection equals an independently computed reference, bitwise") {
    import spark.implicits._
    val data = vecs(20, 8)
    val got = Projection.randomProject(data.toDF("vec_id", "embedding"), k = 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    data.foreach { case (id, v) =>
      (0 until 4).foreach { i =>
        var acc = 0.0
        v.indices.foreach(j => acc += v(j).toDouble * Projection.planeCoeff(i, j))
        assert(got((id, i)) == acc, s"vec $id dim $i")
      }
    }
  }

  test("plane coefficients are in [-1, 1) and deterministic") {
    val cs = for (i <- 0 until 8; j <- 0 until 64) yield Projection.planeCoeff(i, j)
    assert(cs.forall(c => c >= -1.0 && c < 1.0))
    assert(cs == (for (i <- 0 until 8; j <- 0 until 64) yield Projection.planeCoeff(i, j)))
    // coefficients are not degenerate (spread over the range)
    assert(cs.count(_ > 0) > cs.length / 4 && cs.count(_ < 0) > cs.length / 4)
  }

  test("power-of-two input scaling scales the projection exactly (pure binary scaling)") {
    import spark.implicits._
    val data = vecs(10, 8)
    val scaled = data.map { case (id, v) => (id, v.map(_ * 4.0f)) }
    val p1 = Projection.randomProject(data.toDF("vec_id", "embedding"), 4, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val p4 = Projection.randomProject(scaled.toDF("vec_id", "embedding"), 4, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    p1.foreach { case (k, v) => assert(p4(k) == v * 4.0, s"$k") }
  }

  test("short vectors project on their length; k x n_rows output shape") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f))).toDF("vec_id", "embedding")
    val out = Projection.randomProject(df, k = 3, dim = 8).collect()
    assert(out.length == 6)
    val one = out.find(r => r.getLong(0) == 2L && r.getInt(1) == 0).get.getDouble(2)
    assert(one == 3.0f.toDouble * Projection.planeCoeff(0, 0))
  }
}
