package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] = {
    import spark.implicits._
    Clusters.connectedComponents(edges.toDF("src", "dst"), maxIter = maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two disjoint components get their min ids as labels") {
    val got = cc(Seq((5L, 3L), (3L, 9L), (20L, 21L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("a path graph converges to one component (diameter > 1 iteration)") {
    // 0-1-2-...-9 as a chain: min label must travel the full diameter
    val got = cc((0L until 9L).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 9L).toSet)
  }

  test("label propagation is direction-agnostic (edges are undirected)") {
    assert(cc(Seq((7L, 1L))) == Map(1L -> 1L, 7L -> 1L))
    assert(cc(Seq((1L, 7L))) == Map(1L -> 1L, 7L -> 1L))
  }

  test("maxIter caps the rounds: a chain longer than maxIter stays partial") {
    // with 1 iteration, node k sees only labels within distance 1
    val got = cc((0L until 5L).map(i => (i, i + 1)), maxIter = 1)
    assert(got(0L) == 0L && got(1L) == 0L)
    assert(got(4L) == 3L, "distance-4 node cannot have received label 0 in one round")
  }

  test("empty edge set yields an empty labeling") {
    import spark.implicits._
    val empty = Clusters.connectedComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("id", "comp"))
  }

  test("duplicate and self edges are harmless") {
    val got = cc(Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }
}
