package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LogHistogramSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def df(values: Seq[Double], group: String = "g") = {
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) => (i.toLong, group, v) }
      .toDF("event_id", "event_type", "value")
  }

  test("bucket math: hand-checked cents land in the right quarter-log2 buckets") {
    val got = LogHistogram.sketch(df(Seq(0.01, 1.00, 0.01, 4.00)))
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(3))).sortBy(_._1)
    // 0.01 -> c=1:   e=0, sub=0 -> bucket 0,  lb quarter-cents 4  -> 0.01
    // 1.00 -> c=100: e=6, 400>>6=6, sub=2 -> bucket 26, lb 6<<6=384 -> 0.96
    // 4.00 -> c=400: e=8, 1600>>8=6, sub=2 -> bucket 34, lb 6<<8=1536 -> 3.84
    assert(got.toSeq == Seq((0, 0.01, 2L), (26, 0.96, 1L), (34, 3.84, 1L)))
  }

  test("sketch is mergeable: bucket-wise sum of two halves equals the full sketch") {
    val vals = (1 to 500).map(i => (i * 37 % 997) / 100.0 + 0.01)
    val (h1, h2) = vals.splitAt(250)
    val full = LogHistogram.sketch(df(vals)).collect()
      .map(r => (r.getInt(1), r.getDouble(2)) -> r.getLong(3)).toMap
    val merged = (LogHistogram.sketch(df(h1)).collect() ++ LogHistogram.sketch(df(h2)).collect())
      .map(r => (r.getInt(1), r.getDouble(2)) -> r.getLong(3))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    assert(merged == full)
  }

  test("sketch state is partitioning-invariant (merge order cannot matter)") {
    val vals = (1 to 300).map(i => (i * 91 % 1009) / 100.0 + 0.01)
    def state(parts: Int) = LogHistogram.sketch(df(vals).repartition(parts))
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(state(1) == state(7) && state(7) == state(32))
  }

  test("quantile estimates carry the one-sided 2^(1/4) relative-error guarantee") {
    val gamma = math.pow(2.0, 0.25)
    val vals = (1 to 1000).map(i => ((i * 131) % 49999 + 1) / 100.0)
    val sorted = vals.sorted
    val got = LogHistogram.quantiles(df(vals)).collect()
      .map(r => r.getDouble(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val (rank, est) = got(q)
      assert(rank == math.ceil(q * vals.size).toLong)
      val exact = sorted((rank - 1).toInt) // rank-based discrete quantile
      assert(est <= exact && exact < est * gamma,
        s"q=$q est=$est exact=$exact outside [est, est*gamma)")
    }
  }

  test("values at or below zero collapse into the reserved -1 bucket with lb 0") {
    val got = LogHistogram.sketch(df(Seq(-3.5, 0.0, 2.0)))
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(3))).sortBy(_._1)
    assert(got.head == ((-1, 0.0, 2L)) && got.length == 2)
  }
}
