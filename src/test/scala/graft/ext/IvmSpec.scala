package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class IvmSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def df(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }
  private def delta(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v", "op")
  }

  private def collect(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

  test("inserts, retractions, and the merged view equal a recompute") {
    val base = df(Seq(("a", 10L), ("a", 20L), ("b", 5L)))
    val d = delta(Seq(
      ("a", 30L, "I"),  // new a row
      ("a", 10L, "R"),  // retract one a row
      ("c", 7L, "I")))  // brand-new group
    val got = collect(Ivm.maintainAgg(base, d, "k", "v"))
    assert(got("a") == (2L, 50L, 25.0), "a: {20, 30} after maintenance")
    assert(got("b") == (1L, 5L, 5.0), "untouched group flows through")
    assert(got("c") == (1L, 7L, 7.0), "a delta-only group appears")
  }

  test("a fully-retracted group disappears (exact multiset, not a zero row)") {
    val base = df(Seq(("x", 3L), ("y", 1L)))
    val d = delta(Seq(("x", 3L, "R")))
    val got = collect(Ivm.maintainAgg(base, d, "k", "v"))
    assert(got.keySet == Set("y"))
  }

  test("maintained view equals full recompute on random base/delta") {
    val rnd = new scala.util.Random(53)
    val keys = Seq("p", "q", "r", "s")
    val base = (0 until 200).map(_ => (keys(rnd.nextInt(4)), rnd.nextInt(100).toLong))
    val inserts = (0 until 60).map(_ => (keys(rnd.nextInt(4)), rnd.nextInt(100).toLong, "I"))
    // retract a random subset of actual base rows (multiset-consistent)
    val retracts = rnd.shuffle(base).take(50).map { case (k, v) => (k, v, "R") }
    val got = collect(Ivm.maintainAgg(df(base), delta(inserts ++ retracts), "k", "v"))
    val effective = (base ++ inserts.map(t => (t._1, t._2)))
      .diff(retracts.map(t => (t._1, t._2)))
    val want = effective.groupBy(_._1).map { case (k, g) =>
      val s = g.map(_._2).sum
      k -> (g.size.toLong, s, s.toDouble / g.size.toDouble)
    }
    assert(got == want)
  }

  test("unknown ops and null keys/values are ignored, not miscounted") {
    val base = df(Seq(("a", 1L)))
    import spark.implicits._
    val d = Seq(
      (Option("a"), Option(2L), "I"),
      (Option("a"), Option(9L), "X"),   // unknown op: dropped
      (None, Option(9L), "I"),          // null key
      (Option("a"), None, "I"))         // null value
      .toDF("k", "v", "op")
    val got = collect(Ivm.maintainAgg(base, d, "k", "v"))
    assert(got == Map("a" -> (2L, 3L, 1.5)))
  }
}
