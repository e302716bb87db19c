package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** threshold 0 forces the distributed label-propagation path; the default
    * routes graphs this small through the driver union-find fast path —
    * core semantics are asserted on BOTH.
    */
  private def cc(
      edges: Seq[(Long, Long)],
      maxIter: Int = 20,
      threshold: Long = 1000000L,
      failOnNonConvergence: Boolean = true): Map[Long, Long] = {
    import spark.implicits._
    Clusters.connectedComponents(
      edges.toDF("src", "dst"), maxIter = maxIter, driverEdgeThreshold = threshold,
      failOnNonConvergence = failOnNonConvergence)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def onBothPaths(edges: Seq[(Long, Long)])(assertion: Map[Long, Long] => Unit): Unit = {
    assertion(cc(edges))
    assertion(cc(edges, threshold = 0L))
  }

  test("two disjoint components get their min ids as labels (both paths)") {
    onBothPaths(Seq((5L, 3L), (3L, 9L), (20L, 21L))) { got =>
      assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
    }
  }

  test("a path graph converges to one component (diameter > 1 iteration, both paths)") {
    // 0-1-2-...-9 as a chain: min label must travel the full diameter
    onBothPaths((0L until 9L).map(i => (i, i + 1))) { got =>
      assert(got.values.toSet == Set(0L))
      assert(got.keySet == (0L to 9L).toSet)
    }
  }

  test("label propagation is direction-agnostic (edges are undirected, both paths)") {
    onBothPaths(Seq((7L, 1L)))(got => assert(got == Map(1L -> 1L, 7L -> 1L)))
    onBothPaths(Seq((1L, 7L)))(got => assert(got == Map(1L -> 1L, 7L -> 1L)))
  }

  test("driver fast path and distributed path agree on a random graph") {
    val rng = new scala.util.Random(42)
    val edges = Seq.fill(300)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
    assert(cc(edges) == cc(edges, threshold = 0L))
  }

  test("maxIter caps the rounds: a chain longer than maxIter stays partial") {
    // with 1 iteration, node k sees only labels within distance 1
    // (distributed path only — the fast path has no rounds to cap); partial
    // labels require the explicit opt-out
    val got = cc((0L until 5L).map(i => (i, i + 1)),
      maxIter = 1, threshold = 0L, failOnNonConvergence = false)
    assert(got(0L) == 0L && got(1L) == 0L)
    assert(got(4L) == 3L, "distance-4 node cannot have received label 0 in one round")
  }

  test("exhausting maxIter without convergence throws by default") {
    // a 6-node chain needs >2 rounds for label 0 to reach node 5, plus one
    // probe round — maxIter=2 exhausts the budget mid-propagation
    val ex = intercept[IllegalStateException] {
      cc((0L until 5L).map(i => (i, i + 1)), maxIter = 2, threshold = 0L)
    }
    assert(ex.getMessage.contains("maxIter=2"))
  }

  test("maxIter == 1 under failOnNonConvergence is rejected up front") {
    // the change-based probe can only prove a fixpoint one round AFTER it
    // is reached, so a 1-round budget could never prove anything: reject it
    // eagerly instead of always throwing after a wasted round
    val ex = intercept[IllegalArgumentException] {
      cc(Seq((1L, 2L)), maxIter = 1, threshold = 0L)
    }
    assert(ex.getMessage.contains("maxIter >= 2"))
  }

  test("a graph converging in exactly maxIter-1 rounds passes (probe round budgeted)") {
    // 3-node chain: fixpoint after 2 rounds, proven in round 3 = maxIter
    val got = cc(Seq((0L, 1L), (1L, 2L)), maxIter = 3, threshold = 0L)
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("empty edge set yields an empty labeling (both paths)") {
    import spark.implicits._
    Seq(1000000L, 0L).foreach { th =>
      val empty = Clusters.connectedComponents(
        Seq.empty[(Long, Long)].toDF("src", "dst"), driverEdgeThreshold = th)
      assert(empty.count() == 0L)
      assert(empty.columns.toSeq == Seq("id", "comp"))
    }
  }

  test("duplicate and self edges are harmless (both paths)") {
    onBothPaths(Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L))) { got =>
      assert(got == Map(1L -> 1L, 2L -> 1L))
    }
  }
}
