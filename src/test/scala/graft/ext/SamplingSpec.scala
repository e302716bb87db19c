package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("split assignment matches the reference implementation exactly") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val got = Sampling.deterministicSplit(df, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 2000L).foreach { i =>
      assert(got(i) == Sampling.splitOf(i.toString, splits), s"id $i")
    }
  }

  test("realized proportions are close to the requested fractions") {
    import spark.implicits._
    val n = 20000L
    val counts = Sampling.deterministicSplit((0L until n).toDF("id"), "id", splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    splits.foreach { case (name, frac) =>
      val p = counts.getOrElse(name, 0L).toDouble / n
      assert(math.abs(p - frac) < 0.02, s"$name: $p vs $frac") // ~6 sigma at n=20k
    }
  }

  test("assignment is stable: adding rows never moves an existing id") {
    import spark.implicits._
    val small = Sampling.deterministicSplit((0L until 100L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val large = Sampling.deterministicSplit((0L until 10000L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => assert(large(id) == s) }
  }

  test("degenerate and invalid fraction specs are rejected") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException](Sampling.deterministicSplit(df, "id", Seq.empty))
    intercept[IllegalArgumentException](
      Sampling.deterministicSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      Sampling.deterministicSplit(df, "id", Seq("a" -> 1.5, "b" -> -0.5)))
    // single split: everything lands in it
    val one = Sampling.deterministicSplit(df, "id", Seq("all" -> 1.0)).head()
    assert(one.getString(1) == "all")
  }

  test("a cumulative fraction at 1.0 before the last split cannot misroute rows") {
    import spark.implicits._
    // floor(1.0 * 2^32) needs 9 hex chars; without clamping, the 8-char md5
    // prefix compare would send ~15/16 of ids to the near-zero split
    val degenerate = Seq("a" -> 1.0, "b" -> 1e-12)
    val counts = Sampling.deterministicSplit((0L until 5000L).toDF("id"), "id", degenerate)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("a", 0L) >= 4999L, s"boundary overflow misrouted rows: $counts")
    (0L until 100L).foreach { i =>
      assert(Sampling.splitOf(i.toString, degenerate) == "a")
    }
  }
}
