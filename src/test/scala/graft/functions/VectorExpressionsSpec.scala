package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.GraftFunctions
import graft.functions.VectorFunctions._

/** The native codegen'd vector expressions must be BITWISE equal to the
  * higher-order-function reference forms (same left-fold accumulation), and
  * usable from SQL once registered.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def randomVecs(n: Int, dim: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian()), Seq.fill(dim)(rng.nextGaussian())))
      .toDF("id", "a", "b")
  }

  test("native dot/norm match the HOF forms bitwise") {
    val df = randomVecs(200, 64)
      .select(
        dot(col("a"), col("b")).as("dn"),
        dotHof(col("a"), col("b")).as("dh"),
        l2Norm(col("a")).as("nn"),
        l2NormHof(col("a")).as("nh"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "norm mismatch")
    }
  }

  test("squaredDistance agrees with dot-expansion within FP tolerance and is exact on ints") {
    val df = randomVecs(50, 16)
      .select(
        squaredDistance(col("a"), col("b")).as("d2"),
        (dot(col("a"), col("a")) - lit(2.0) * dot(col("a"), col("b")) + dot(col("b"), col("b"))).as("expanded"))
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("null inputs yield null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(dot(col("a"), col("b")), l2Norm(col("b"))).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("null ELEMENTS propagate to null, matching the HOF forms") {
    import spark.implicits._
    val df = Seq((Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0)))).toDF("a", "b")
    val r = df.select(
      dot(col("a"), col("b")),
      dotHof(col("a"), col("b")),
      l2Norm(col("a")),
      squaredDistance(col("a"), col("b"))).collect().head
    assert((0 to 3).forall(r.isNullAt), r.toString)
  }

  test("SQL surface after registration: vec_dot/vec_norm/vec_dist2") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       vec_norm(array(3.0d, 4.0d)) AS n,
        |       vec_dist2(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS d2""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 25.0)
  }

  test("type mismatch is a clean analysis error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array('x'), array('y'))").collect()
    }
    assert(e.getMessage.contains("vec_dot") || e.getMessage.toLowerCase.contains("array<double>"), e.getMessage)
  }
}
