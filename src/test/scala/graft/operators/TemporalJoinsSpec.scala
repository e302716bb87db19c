package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("asof: latest right at-or-before each left time, per key, null when none") {
    import spark.implicits._
    val left = Seq(
      ("A", 5L, "l5"), ("A", 10L, "l10"), ("A", 15L, "l15"), ("A", 25L, "l25"),
      ("B", 7L, "lB"), // key with no rights
      ("C", 9L, "lC")).toDF("k", "t", "lv")
    val right = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0),
      ("C", 9L, 3.0), // exact tie: right at equal time IS visible
      ("D", 1L, 9.0)).toDF("k", "t", "rv") // right-only key never emits
    val got = TemporalJoins.asof(left, right, key = "k", time = "t")
      .select(col("k"), col("t"), col("lv"), col("asof.t").as("rt"), col("asof.rv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3), if (r.isNullAt(4)) null else r.getDouble(4)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      ("A", 5L, "l5", null, null),     // before any right
      ("A", 10L, "l10", 10L, 1.0),     // tie visible
      ("A", 15L, "l15", 10L, 1.0),
      ("A", 25L, "l25", 20L, 2.0),
      ("B", 7L, "lB", null, null),
      ("C", 9L, "lC", 9L, 3.0)))
  }

  test("asof null semantics match SQL ASOF: null keys/times never match") {
    import spark.implicits._
    val left = Seq(
      (Option("A"), Option(10L), "lA"),
      (Option.empty[String], Option(10L), "lNullK"),   // null key: no partner
      (Option("A"), Option.empty[Long], "lNullT"))     // null time: t >= x never true
      .toDF("k", "t", "lv")
    val right = Seq(
      (Option("A"), Option(5L), 1.0),
      (Option.empty[String], Option(5L), 66.0),        // null-key right: matches nothing
      (Option("A"), Option.empty[Long], 77.0))         // null-time right: matches nothing
      .toDF("k", "t", "rv")
    val got = TemporalJoins.asof(left, right, "k", "t")
      .select(col("lv"), col("asof.rv"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got == Map("lA" -> 1.0, "lNullK" -> null, "lNullT" -> null))
  }

  test("asof plan: one hash exchange, no nested-loop join") {
    import spark.implicits._
    val left = Seq(("A", 1L, "x")).toDF("k", "t", "lv")
    val right = Seq(("A", 1L, 1.0)).toDF("k", "t", "rv")
    val p = TemporalJoins.asof(left, right, "k", "t").queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"asof must shuffle once on the key, saw $exchanges:\n$p")
  }

  test("rangeJoin: closed-interval membership, each pair exactly once across buckets") {
    import spark.implicits._
    val intervals = Seq((1L, 0L, 10L), (2L, 5L, 15L), (3L, 20L, 20L)).toDF("iid", "s", "e")
    val points = Seq(0L, 5L, 10L, 15L, 16L, 20L).toDF("p")
    // bucket width 4 forces every interval to span multiple buckets
    val got = TemporalJoins.rangeJoin(intervals, points, "s", "e", "p", bucketWidth = 4L)
      .select("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    val expected = for {
      (iid, s, e) <- Seq((1L, 0L, 10L), (2L, 5L, 15L), (3L, 20L, 20L))
      p <- Seq(0L, 5L, 10L, 15L, 16L, 20L) if p >= s && p <= e
    } yield (iid, p)
    assert(got.toSeq == expected.sortBy(identity))
    assert(got.length == got.distinct.length, "a pair was emitted through two buckets")
  }

  test("rangeJoin rejects shared column names and runaway interval spans") {
    import spark.implicits._
    val points = Seq(3L).toDF("p")
    // shared column name -> loud requirement failure, not a silent ambiguity
    val clash = Seq((1L, 0L, 10L)).toDF("p", "s", "e")
    val err = intercept[IllegalArgumentException](
      TemporalJoins.rangeJoin(clash, points, "s", "e", "p", 4L))
    assert(err.getMessage.contains("disjoint column names"))
    // an open-ended sentinel interval fails fast instead of asking
    // sequence() for billions of elements
    val openEnded = Seq((1L, 0L, Long.MaxValue)).toDF("iid", "s", "e")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val boom = intercept[Exception](
      TemporalJoins.rangeJoin(openEnded, points, "s", "e", "p", 4L).collect())
    assert(messages(boom).exists(_.contains("buckets")), boom.getMessage)
  }

  test("rangeJoin plan: equi-join on the bucket, not a nested loop") {
    import spark.implicits._
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val points = Seq(3L).toDF("p")
    val p = TemporalJoins.rangeJoin(intervals, points, "s", "e", "p", 4L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("effectiveDatedJoin: version boundaries are [from, to); gaps match nothing") {
    import spark.implicits._
    // key 1: version A valid [0, 100), version B valid [100, 200); a gap after 200
    val dim = Seq(
      (1L, 0L, 100L, "A"), (1L, 100L, 200L, "B"),
      (2L, 0L, 50L, "X"))
      .toDF("k", "valid_from", "valid_to", "version")
    val facts = Seq(
      (1L, 99L), (1L, 100L), (1L, 199L), (1L, 250L), // A, B (boundary!), B, gap
      (2L, 10L), (3L, 10L))                          // X, unknown key
      .toDF("k", "t")
    val inner = TemporalJoins.effectiveDatedJoin(facts, dim, "k", "t", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    assert(inner == Set((1L, 99L, "A"), (1L, 100L, "B"), (1L, 199L, "B"), (2L, 10L, "X")))
    // left join keeps gap/unknown facts with a null version
    val left = TemporalJoins.effectiveDatedJoin(
      facts, dim, "k", "t", "valid_from", "valid_to", joinType = "left")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getString(4)))).toSet
    assert(left.contains((1L, 250L, None)) && left.contains((3L, 10L, None)))
    assert(left.size == facts.count().toInt)
    // overlapping-name guard
    intercept[IllegalArgumentException](
      TemporalJoins.effectiveDatedJoin(
        facts.withColumn("version", lit("clash")), dim, "k", "t", "valid_from", "valid_to"))
  }
}
