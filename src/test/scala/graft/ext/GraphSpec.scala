package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** Driver-side replica of the exact fixed-point recurrence — an
    * independent implementation the distributed one must match node for
    * node.
    */
  private def referencePagerank(
      edges: Seq[(Long, Long, Long)], iterations: Int, scale: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val outd = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = (15L * scale) / (100L * n)
    var pr = nodes.map(_ -> scale / n).toMap
    (0 until iterations).foreach { _ =>
      val inc = edges
        .groupBy(_._2)
        .map { case (d, es) => d -> es.map { case (s, _, w) => w * (pr(s) / outd(s)) }.sum }
      pr = nodes.map(h => h -> (base + (85L * inc.getOrElse(h, 0L)) / 100L)).toMap
    }
    pr
  }

  test("pagerank: distributed fixed-point equals the driver-side recurrence exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val edges = (0 until 300).map { _ =>
      val s = rnd.nextInt(40).toLong; var d = rnd.nextInt(40).toLong
      if (d == s) d = (d + 1) % 40
      (s, d, rnd.nextInt(3) + 1L)
    }.groupBy(e => (e._1, e._2)).map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
    // force the DISTRIBUTED path; the driver fast path is the reference
    val got = Graph.pagerank(edges.toDF("src", "dst", "weight"), iterations = 10,
      driverEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = referencePagerank(edges, 10, 1000000000000L)
    assert(got == want)
    // and the driver fast path agrees with both
    val fast = Graph.pagerank(edges.toDF("src", "dst", "weight"), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want)
  }

  test("pagerank: a sink-heavy star concentrates score; authority ordering is right") {
    import spark.implicits._
    // hub 0 links to 1..5; everyone also links to 9 (the authority)
    val edges = ((1L to 5L).map(d => (0L, d, 1L)) ++ (0L to 5L).map(s => (s, 9L, 1L))).toDF("src", "dst", "weight")
    val pr = Graph.pagerank(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(9L) > pr(0L), "the commonly-linked authority must outrank the hub")
    assert((1L to 5L).forall(h => pr(9L) > pr(h)))
    // all mass non-negative and bounded by the scale
    assert(pr.values.forall(v => v >= 0 && v <= 1000000000000L))
  }

  test("pagerank: zero iterations returns the uniform start; empty-ish graphs behave") {
    import spark.implicits._
    val edges = Seq((0L, 1L, 1L), (1L, 0L, 1L)).toDF("src", "dst", "weight")
    val pr0 = Graph.pagerank(edges, iterations = 0).collect().map(_.getLong(1)).toSet
    assert(pr0 == Set(500000000000L))
    // a two-node cycle is symmetric: equal scores at any depth
    val pr = Graph.pagerank(edges, iterations = 7).collect().map(_.getLong(1)).toSet
    assert(pr.size == 1, "symmetric cycle must stay symmetric")
  }

  /** Driver-side replica of the exact HITS recurrence with integer
    * rescaling.
    */
  private def referenceHits(
      edges: Seq[(Long, Long, Long)], iterations: Int, scale: Long): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    def rescale(m: Map[Long, Long]): Map[Long, Long] = {
      val s = m.values.sum
      if (s == 0) m else m.map { case (k, v) => k -> (v * scale) / s }
    }
    var hub = nodes.map(_ -> scale).toMap
    var auth = nodes.map(_ -> 0L).toMap
    (0 until iterations).foreach { _ =>
      auth = rescale(nodes.map { h =>
        h -> edges.filter(_._2 == h).map { case (s, _, w) => w * hub(s) }.sum
      }.toMap)
      hub = rescale(nodes.map { h =>
        h -> edges.filter(_._1 == h).map { case (_, d, w) => w * auth(d) }.sum
      }.toMap)
    }
    nodes.map(h => h -> ((hub(h), auth(h)))).toMap
  }

  test("hits: distributed fixed-point equals the driver-side recurrence exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val edges = (0 until 250).map { _ =>
      val s = rnd.nextInt(30).toLong; var d = rnd.nextInt(30).toLong
      if (d == s) d = (d + 1) % 30
      (s, d, rnd.nextInt(3) + 1L)
    }.groupBy(e => (e._1, e._2)).map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
    // distributed path vs the independent recurrence, then the driver
    // fast path vs both
    val got = Graph.hits(edges.toDF("src", "dst", "weight"), iterations = 8,
      driverEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = referenceHits(edges, 8, 1000000L)
    assert(got == want)
    val fast = Graph.hits(edges.toDF("src", "dst", "weight"), iterations = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fast == want)
  }

  test("hits: hubs and authorities separate on a bipartite fan") {
    import spark.implicits._
    // 0,1,2 all link to 8 and 9; nothing links back
    val edges = (for (s <- 0L to 2L; d <- Seq(8L, 9L)) yield (s, d, 1L)).toDF("src", "dst", "weight")
    val r = Graph.hits(edges).collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    (0L to 2L).foreach { h => assert(r(h)._1 > 0 && r(h)._2 == 0, s"$h is a pure hub") }
    Seq(8L, 9L).foreach { h => assert(r(h)._1 == 0 && r(h)._2 > 0, s"$h is a pure authority") }
  }

  /** Brute-force per-node triangle counts: try every 3-subset of nodes
    * against the undirected edge set — the O(n³) ground truth the
    * oriented wedge enumeration must match.
    */
  private def referenceTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val cnt = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if und((a, b)) && und((a, c)) && und((b, c))
    } { cnt(a) += 1; cnt(b) += 1; cnt(c) += 1 }
    cnt.toMap
  }

  test("triangles: K4 is all-triangles, a path is none, lcc is exact") {
    import spark.implicits._
    // K4 on {0,1,2,3} plus a pendant path 3-4-5
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b, 1L)
    val edges = (k4 ++ Seq((3L, 4L, 1L), (4L, 5L, 1L))).toDF("src", "dst", "weight")
    val r = Graph.triangles(edges).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    (0L to 2L).foreach { h => assert(r(h) == ((3L, 3L, 1.0)), s"K4 interior $h") }
    assert(r(3L) == ((4L, 3L, 0.5)), "node 3: deg 4, still only K4's 3 triangles, lcc 6/12")
    assert(r(4L) == ((2L, 0L, 0.0)), "path interior: deg 2, no triangle")
    assert(r(5L) == ((1L, 0L, 0.0)), "leaf: deg < 2 short-circuits lcc to 0.0")
  }

  test("triangles: oriented wedge enumeration equals brute force; direction/duplicates ignored") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = (0 until 400).map { _ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong) }
      .filter(e => e._1 != e._2)
    // feed BOTH directions and duplicates — the undirected-ify must collapse them
    val noisy = (base ++ base.map(_.swap) ++ base.take(50)).map(e => (e._1, e._2, 1L))
    val got = Graph.triangles(noisy.toDF("src", "dst", "weight")).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    val want = referenceTriangles(base)
    assert(got == want)
  }

  test("hostEdges: deterministic, self-loop-free, weights aggregate multiplicity") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val e1 = Graph.hostEdges(docs).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val e2 = Graph.hostEdges(docs).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(e1 == e2, "fixture must be deterministic")
    assert(e1.keys.forall { case (s, d) => s != d })
    assert(e1.keys.forall { case (s, d) => s >= 0 && s < 64 && d >= 0 && d < 64 })
    assert(e1.values.sum <= 500, "at most one link per doc")
  }

  /** Driver replica of the bounded BFS recurrence. */
  private def referenceBfs(
      edges: Seq[(Long, Long)], seeds: Set[Long], rounds: Int): Map[Long, Option[Long]] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var dep = nodes.map(h => h -> (if (seeds(h)) 0L else Graph.Unreached)).toMap
    (0 until rounds).foreach { _ =>
      dep = nodes.map { h =>
        val cand = edges.collect { case (u, v) if v == h => dep(u) + 1 }
          .foldLeft(Graph.Unreached)(math.min)
        h -> math.min(dep(h), cand)
      }.toMap
    }
    dep.map { case (h, d) => h -> (if (d >= Graph.Unreached) None else Some(d)) }
  }

  test("bfs: chain depths, unreachable NULL, and the round horizon") {
    import spark.implicits._
    // 0 -> 1 -> 2 -> 3; island 8 -> 9 never touched by the seed
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L))
      .map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "weight")
    val seeds = Seq(0L).toDF("h")
    def run(r: Int) = Graph.bfs(edges, seeds, rounds = r).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(run(8) == Map(0L -> Some(0L), 1L -> Some(1L), 2L -> Some(2L), 3L -> Some(3L),
      8L -> None, 9L -> None))
    // a 2-round budget cannot see depth 3 — the bounded contract, not a bug
    assert(run(2)(3L).isEmpty && run(2)(2L).contains(2L))
  }

  test("bfs: distributed path equals the driver recurrence exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 250).map { _ =>
      val s = rnd.nextInt(60).toLong; var d = rnd.nextInt(60).toLong
      if (d == s) d = (d + 1) % 60
      (s, d)
    }.distinct
    val seeds = Seq(0L, 16L, 32L)
    val edf = edges.map(e => (e._1, e._2, 1L)).toDF("src", "dst", "weight")
    val want = referenceBfs(edges, seeds.toSet, 8)
    val dist = Graph.bfs(edf, seeds.toDF("h"), rounds = 8, driverEdgeThreshold = 0)
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(dist == want)
    val fast = Graph.bfs(edf, seeds.toDF("h"), rounds = 8)
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(fast == want)
  }

  test("crawlPriority: score is pr DIV (1+depth), unreached hosts score 0, cut ordered") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 1L), (8L, 9L))
      .map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "weight")
    val out = Graph.crawlPriority(edges, Seq(0L).toDF("h"), topK = 10, k = 2, rounds = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSet == Set(0L, 1L, 2L, 8L, 9L))
    out.foreach { case (h, pr, depth, _, score) =>
      depth match {
        case Some(d) => assert(score == pr / (1 + d), s"host $h")
        case None => assert(score == 0L, s"unreached host $h must score 0")
      }
    }
    // emitted in (score desc, host) order
    val scores = out.map(t => (-t._5, t._1)).toSeq
    assert(scores == scores.sorted, s"cut must be ordered: $out")
    assert(out.filter(_._3.isEmpty).forall(t => t._1 == 8L || t._1 == 9L))
  }

  /** Driver replica of the bounded k-core peel. */
  private def referenceKcore(
      edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    (0 until rounds).foreach { _ =>
      val deg = (es.map(_._1) ++ es.map(_._2)).groupBy(identity).map { case (h, g) => h -> g.size }
      val alive = deg.filter(_._2 >= k).keySet
      es = es.filter { case (u, v) => alive(u) && alive(v) }
    }
    (es.map(_._1) ++ es.map(_._2)).groupBy(identity).map { case (h, g) => h -> g.size.toLong }
      .filter(_._2 >= k)
  }

  test("kcore: pendant cascade peels down to the clique") {
    import spark.implicits._
    // 5-clique + a pendant chain 4-10-11: chain nodes die at k=3 in cascade
    val clique = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    val edges = (clique ++ Seq((4L, 10L), (10L, 11L)))
      .map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "weight")
    val got = Graph.kcore(edges, k = 3, rounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 5L).map(_ -> 4L).toMap)
  }

  test("kcore: distributed equals the driver recurrence; 8 rounds reach the fixed point") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val edges = (0 until 400).map { _ =>
      val s = rnd.nextInt(50).toLong; var d = rnd.nextInt(50).toLong
      if (d == s) d = (d + 1) % 50
      (s, d)
    }.distinct
    val edf = edges.map(e => (e._1, e._2, 1L)).toDF("src", "dst", "weight")
    val want = referenceKcore(edges, 10, 8)
    val dist = Graph.kcore(edf, k = 10, rounds = 8, driverEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == want)
    val fast = Graph.kcore(edf, k = 10, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want)
    // the peel is monotone and must have settled inside the budget
    assert(referenceKcore(edges, 10, 9) == want, "fixture must reach its fixed point by round 8")
  }

  /** Driver replica of synchronous LPA with (count desc, label asc) ties. */
  private def referenceLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    val nb = (und ++ und.map(_.swap)).groupBy(_._1).map { case (h, g) => h -> g.map(_._2) }
    var lbl = nb.keys.map(h => h -> h).toMap
    (0 until rounds).foreach { _ =>
      lbl = nb.map { case (h, ns) =>
        val counts = ns.map(lbl).groupBy(identity).map { case (l, g) => (l, g.size) }
        h -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  test("lpa: two cliques joined by one bridge edge keep separate communities") {
    import spark.implicits._
    val cliqueA = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    val cliqueB = for (a <- 10L until 15L; b <- (a + 1) until 15L) yield (a, b)
    val edges = (cliqueA ++ cliqueB ++ Seq((4L, 10L)))
      .map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "weight")
    val got = Graph.lpa(edges, rounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val comA = (0L until 5L).map(got).toSet
    val comB = (10L until 15L).map(got).toSet
    assert(comA.size == 1 && comB.size == 1, s"each clique must agree internally: $got")
    assert(comA != comB, "the bridge must not merge the cliques (unlike connected components)")
  }

  test("lpa: distributed path equals the driver recurrence exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val edges = (0 until 300).map { _ =>
      val s = rnd.nextInt(50).toLong; var d = rnd.nextInt(50).toLong
      if (d == s) d = (d + 1) % 50
      (s, d)
    }.distinct
    val edf = edges.map(e => (e._1, e._2, 1L)).toDF("src", "dst", "weight")
    val want = referenceLpa(edges, 8)
    val dist = Graph.lpa(edf, rounds = 8, driverEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == want)
    val fast = Graph.lpa(edf, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want)
  }

  test("lpa: tie-break adopts the smallest label, no self-vote") {
    import spark.implicits._
    // star: center 5 with leaves 1, 2 — leaves see only {5}; center sees {1, 2},
    // tie broken toward 1. One round makes center 1, leaves 5.
    val edges = Seq((5L, 1L), (5L, 2L)).map { case (s, d) => (s, d, 1L) }
      .toDF("src", "dst", "weight")
    val got = Graph.lpa(edges, rounds = 1, driverEdgeThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 1L, 1L -> 5L, 2L -> 5L), s"$got")
  }
}
