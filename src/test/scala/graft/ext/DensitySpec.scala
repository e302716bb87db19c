package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DensitySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** Points given directly as (x, y); multiplicity via repetition. */
  private def run(pts: Seq[(Long, Long)], minPts: Long = 3L) = {
    import spark.implicits._
    Density.gridDbscan(pts.toDF("x", "y"), "x", "y", minPts)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
  }

  private def fill(x: Long, y: Long, n: Int) = Seq.fill(n)((x, y))

  test("two separated blobs form two clusters; sparse cells are noise") {
    val blobA = fill(1, 1, 5) ++ fill(1, 2, 4) ++ fill(2, 1, 3) // 8-connected trio
    val blobB = fill(10, 10, 6) ++ fill(11, 11, 4)              // diagonal pair
    val noise = Seq((5L, 5L), (6L, 7L))                         // below minPts
    val got = run(blobA ++ blobB ++ noise)
    val ca = Set((1L, 1L), (1L, 2L), (2L, 1L)).map(got(_)._2)
    val cb = Set((10L, 10L), (11L, 11L)).map(got(_)._2)
    assert(ca.size == 1 && ca.head.isDefined, "blob A must be one cluster")
    assert(cb.size == 1 && cb.head.isDefined, "blob B must be one cluster (diagonal counts)")
    assert(ca != cb, "the blobs are far apart and must not merge")
    assert(got((5L, 5L)) == (1L, None) && got((6L, 7L)) == (1L, None), "noise stays NULL")
  }

  test("a sparse gap breaks a chain; an isolated dense cell keeps its own label") {
    // dense at x=0,1 then a GAP at x=2 (sparse), dense again at x=3
    val chain = fill(0, 0, 3) ++ fill(1, 0, 3) ++ Seq((2L, 0L)) ++ fill(3, 0, 3)
    val got = run(chain)
    assert(got((0L, 0L))._2 == got((1L, 0L))._2)
    assert(got((0L, 0L))._2 != got((3L, 0L))._2, "the gap must separate the clusters")
    assert(got((3L, 0L))._2.isDefined, "an isolated dense cell is its own cluster")
    assert(got((2L, 0L))._2.isEmpty)
  }

  test("labels are min-cell-id and deterministic under partitioning") {
    import spark.implicits._
    val pts = (fill(1, 1, 4) ++ fill(2, 2, 4) ++ fill(3, 3, 4) ++ fill(7, 7, 5)).zipWithIndex
      .map { case ((x, y), i) => (x, y, i) }
    def go(parts: Int) = Density.gridDbscan(
      pts.toDF("x", "y", "i").repartition(parts), "x", "y", 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val a = go(1)
    assert(a == go(13))
    // the diagonal chain 1-2-3 shares the min packed id of cell (1,1)
    val chainLabels = a.filter(t => t._1 <= 3).map(_._3)
    assert(chainLabels.size == 1 && chainLabels.head == 1L * 4000000L + (1L + 1000000L))
  }

  test("out-of-domain coordinates are dropped, not packed ambiguously") {
    val got = run(fill(1, 1, 3) ++ fill(-1, 0, 5) ++ fill(0, 2000000, 5))
    assert(got.keySet == Set((1L, 1L)), "negative x and |y| >= offset must be excluded")
  }
}
