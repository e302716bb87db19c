package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregator must agree with a full sort on every input
  * shape (order-insensitive, tie-broken by id asc).
  */
class TopKSpec extends AnyFunSuite {

  private def viaAggregator(k: Int, xs: Seq[ScoredId], chunks: Int = 4): Seq[ScoredId] = {
    val agg = new TopKAggregator(k)
    val partials = xs.grouped(math.max(1, xs.length / chunks + 1)).map { chunk =>
      chunk.foldLeft(agg.zero)(agg.reduce)
    }
    val merged = partials.foldLeft(agg.zero)(agg.merge)
    agg.finish(merged).toSeq
  }

  private def reference(k: Int, xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  test("matches a full sort over seeded random inputs, any k, any chunking") {
    for (seed <- 0 until 30) {
      val rng = new scala.util.Random(seed)
      val n = rng.nextInt(200)
      val xs = Seq.fill(n)(ScoredId(rng.nextInt(50).toLong, (rng.nextInt(20) - 10) / 4.0))
      for (k <- Seq(1, 3, 10, 64)) {
        assert(viaAggregator(k, xs, chunks = rng.nextInt(6) + 1) == reference(k, xs), s"seed=$seed k=$k")
      }
    }
  }

  test("fewer elements than k returns all, sorted") {
    val xs = Seq(ScoredId(3, 0.5), ScoredId(1, 0.9), ScoredId(2, 0.5))
    assert(viaAggregator(10, xs) == Seq(ScoredId(1, 0.9), ScoredId(2, 0.5), ScoredId(3, 0.5)))
  }

  test("ties broken by id ascending") {
    val xs = Seq(ScoredId(9, 1.0), ScoredId(2, 1.0), ScoredId(5, 1.0))
    assert(viaAggregator(2, xs) == Seq(ScoredId(2, 1.0), ScoredId(5, 1.0)))
  }

  test("empty input -> empty output") {
    assert(viaAggregator(5, Nil).isEmpty)
  }

  test("NaN scores rank first, like SQL ORDER BY score DESC") {
    val xs = Seq(ScoredId(1, 0.9), ScoredId(2, Double.NaN), ScoredId(3, 0.5), ScoredId(4, Double.NaN))
    val got = viaAggregator(3, xs)
    assert(got.map(_.id) == Seq(2L, 4L, 1L)) // NaNs first (id-tiebroken), then best finite
  }

  test("groupedTopK drops null ids/scores instead of crashing the encoder") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val df = Seq(
      (1L, Some(10L), Some(5.0)), (1L, None, Some(9.0)),
      (1L, Some(11L), None), (1L, Some(12L), Some(7.0)))
      .toDF("g", "id", "s")
    val got = graft.plans.ScaleOps.groupedTopK(df, "g", "id", "s", k = 5)
      .collect().map(r => (r.getLong(2), r.getLong(1)))
    // only the two fully-non-null rows rank: 12 (7.0) then 10 (5.0)
    assert(got.toSeq == Seq((12L, 1L), (10L, 2L)))
  }
}
