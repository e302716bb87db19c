package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def run(pts: Seq[(Long, Long, Long)], parts: Int = 5): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Skyline.skyline(pts.toDF("id", "x", "y").repartition(parts), "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) => bx <= x && by <= y && (bx < x || by < y) }
    }.toSet

  test("hand truth table: staircase frontier, dominated interior, duplicate frontier points") {
    val pts = Seq(
      (1L, 1L, 9L), (2L, 5L, 5L), (3L, 9L, 1L),  // the staircase: all frontier
      (4L, 6L, 6L),                               // dominated by 2
      (5L, 5L, 5L),                               // duplicate of 2: BOTH survive
      (6L, 1L, 10L),                              // dominated by 1 (equal x, worse y)
      (7L, 2L, 8L))                               // frontier (between 1 and 2)
    assert(run(pts) == Set((1L, 1L, 9L), (2L, 5L, 5L), (3L, 9L, 1L), (5L, 5L, 5L), (7L, 2L, 8L)))
  }

  test("two-phase equals brute-force dominance on random data, any partitioning") {
    val rnd = new scala.util.Random(41)
    val pts = (1L to 400L).map(i => (i, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    val want = brute(pts)
    assert(run(pts, 1) == want)
    assert(run(pts, 7) == want)
    assert(run(pts, 32) == want)
  }

  test("correlated data collapses to one point; anti-correlated keeps the diagonal") {
    val corr = (1L to 50L).map(i => (i, i, i)) // (1,1) dominates everything
    assert(run(corr) == Set((1L, 1L, 1L)))
    val anti = (1L to 50L).map(i => (i, i, 51L - i)) // nothing dominates anything
    assert(run(anti) == anti.toSet)
  }

  test("nulls are dropped before dominance") {
    import spark.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(3L), java.lang.Long.valueOf(3L)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(1L), java.lang.Long.valueOf(5L))
    ).toDF("id", "x", "y")
    val got = Skyline.skyline(df, "id", "x", "y").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }
}
