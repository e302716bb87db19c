package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def funnelCounts(events: Seq[(Long, String, Long)], steps: Seq[String]): Map[String, Long] = {
    import spark.implicits._
    EventAnalytics.funnel(events.toDF("user_id", "event_type", "ts"), steps)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
  }

  test("funnel requires strictly increasing timestamps across steps") {
    val steps = Seq("view", "click", "buy")
    // user 1: full ordered funnel; user 2: click BEFORE view (never advances);
    // user 3: click at the SAME ts as view (strictness: does not advance)
    val events = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "buy", 300L),
      (2L, "click", 50L), (2L, "view", 60L), (2L, "buy", 70L),
      (3L, "view", 100L), (3L, "click", 100L))
    assert(funnelCounts(events, steps) == Map("view" -> 3L, "click" -> 1L, "buy" -> 1L))
  }

  test("funnel uses the EARLIEST completion of each step (min-ts semantics)") {
    val steps = Seq("view", "click")
    // user's earliest view is at 100; a click at 150 counts even though a
    // later view (at 200) also precedes a click
    val events = Seq((1L, "view", 100L), (1L, "view", 200L), (1L, "click", 150L))
    assert(funnelCounts(events, steps) == Map("view" -> 1L, "click" -> 1L))
  }

  test("funnel step rows come back in order with step indices") {
    import spark.implicits._
    val df = EventAnalytics.funnel(
      Seq((1L, "a", 1L)).toDF("user_id", "event_type", "ts"), Seq("a", "b"))
    val rows = df.collect().sortBy(_.getInt(0))
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "a", 1L), (2, "b", 0L)))
  }

  test("cohort retention cohorts by first-period and counts distinct users") {
    import spark.implicits._
    val p = 1000000L * 100L // period = 100ms in nanos-land: ts DIV 1e6 DIV 100
    // user 1 first in period 0, active in periods 0 and 2; user 2 first in
    // period 2 only; user 3 first in period 0, active 0 only. Two events in
    // the same period count once.
    val events = Seq(
      (1L, "e", 0L), (1L, "e", 10L * 1000000L), (1L, "e", 2L * p),
      (2L, "e", 2L * p + 1L),
      (3L, "e", 5L * 1000000L))
    val got = EventAnalytics.cohortRetention(
      events.toDF("user_id", "event_type", "ts"), periodMillis = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 2L) -> 1L, (2L, 0L) -> 1L))
  }

  test("rolling stats: inclusive range frame per key; ties share a frame; keys isolated") {
    import spark.implicits._
    val events = Seq(
      ("a", 0L, 10.0), ("a", 1000L, 20.0), ("a", 2000L, 60.0), ("a", 5000L, 100.0),
      // b has a timestamp TIE at 1000 — each peer's frame includes the other
      ("b", 1000L, 1.0), ("b", 1000L, 3.0)).toDF("user_id", "ts_ms", "value")
    val got = EventAnalytics.rollingStats(events, windowMillis = 2000L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got(("a", 0L, 10.0)) == ((1L, 10.0, 10.0, 10.0)))
    assert(got(("a", 1000L, 20.0)) == ((2L, 15.0, 10.0, 20.0)))
    // frame [0, 2000] is inclusive at BOTH bounds -> all three events
    assert(got(("a", 2000L, 60.0)) == ((3L, 30.0, 10.0, 60.0)))
    // 5000 looks back to 3000 -> alone
    assert(got(("a", 5000L, 100.0)) == ((1L, 100.0, 100.0, 100.0)))
    assert(got(("b", 1000L, 1.0)) == ((2L, 2.0, 1.0, 3.0)))
    assert(got(("b", 1000L, 3.0)) == ((2L, 2.0, 1.0, 3.0)))
  }

  test("transitionMatrix: per-user ordered bigrams, probabilities sum to 1 per source") {
    import spark.implicits._
    // user 1: view -> click -> buy ; user 2: view -> view -> click
    // transitions from 'view': click (u1), view (u2), click (u2) -> 3 total
    val rows = Seq(
      (1L, "view", 100L, 1L), (1L, "click", 200L, 2L), (1L, "buy", 300L, 3L),
      (2L, "view", 100L, 4L), (2L, "view", 200L, 5L), (2L, "click", 300L, 6L))
    val df = rows.toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.transitionMatrix(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("view", "click") -> ((2L, 2.0 / 3)),
      ("view", "view") -> ((1L, 1.0 / 3)),
      ("click", "buy") -> ((1L, 1.0))))
  }

  test("transitionMatrix: users never bleed into each other; equal stamps break by event id") {
    import spark.implicits._
    // the LAST event of user 1 must not transition into user 2's first;
    // user 3 has equal timestamps ordered by event_id: a -> b -> c
    val rows = Seq(
      (1L, "end", 900L, 1L),
      (2L, "start", 100L, 2L),
      (3L, "a", 500L, 10L), (3L, "b", 500L, 11L), (3L, "c", 500L, 12L))
    val got = EventAnalytics.transitionMatrix(rows.toDF("user_id", "event_type", "ts", "event_id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "c")))
  }

  test("madOutliers flags only the far point; med/mad computed per group") {
    import spark.implicits._
    // type a: 10..18 plus 100. med = 14.5, devs sorted give mad = 2.5,
    // threshold 3*1.4826*2.5 = 11.1195 -> only the 100 (dev 85.5) flags.
    val a = (10 to 18).map(v => (v.toLong, "a", v.toDouble)) :+ ((19L, "a", 100.0))
    // type c: small tight group, no outliers
    val c = (1 to 5).map(v => (100L + v, "c", v.toDouble))
    val got = EventAnalytics.madOutliers((a ++ c).toDF("event_id", "event_type", "value"))
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq((19L, 14.5, 2.5, 85.5 / (1.4826 * 2.5))))
  }

  test("madOutliers: mad = 0 group is degenerate and yields no rows (std=0 guard analog)") {
    import spark.implicits._
    // over half identical -> mad = 0; the 9 is wildly off but robust z is undefined
    val rows = Seq((1L, "b", 5.0), (2L, "b", 5.0), (3L, "b", 5.0), (4L, "b", 5.0), (5L, "b", 9.0))
    assert(EventAnalytics.madOutliers(rows.toDF("event_id", "event_type", "value")).count() == 0L)
  }

  test("madOutliers median is robust: outlier magnitude cannot drag its own threshold") {
    import spark.implicits._
    def flagged(big: Double): Set[Long] = {
      val rows = (10 to 18).map(v => (v.toLong, "a", v.toDouble)) :+ ((19L, "a", big))
      EventAnalytics.madOutliers(rows.toDF("event_id", "event_type", "value"))
        .collect().map(_.getLong(0)).toSet
    }
    // a mean/stddev z-test would wash out as big grows; MAD keeps flagging
    assert(flagged(100.0) == Set(19L) && flagged(1.0e6) == Set(19L))
  }

  private def patternMatches(events: Seq[(Long, String, Long, Long)]) = {
    import spark.implicits._
    EventAnalytics.patternRuns(
      events.toDF("user_id", "event_type", "ts", "event_id"),
      "view", "click", "purchase")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
  }

  test("patternRuns: contiguous view+ click+ purchase+ matches; interleaving breaks it") {
    val ok = Seq( // u1: VV C PPP -> one match with run lengths 2,1,3
      (1L, "view", 10L, 1L), (1L, "view", 20L, 2L), (1L, "click", 30L, 3L),
      (1L, "purchase", 40L, 4L), (1L, "purchase", 50L, 5L), (1L, "purchase", 60L, 6L))
    val broken = Seq( // u2: V C ERROR P -> the error event splits the runs
      (2L, "view", 10L, 7L), (2L, "click", 20L, 8L),
      (2L, "error", 30L, 9L), (2L, "purchase", 40L, 10L))
    assert(patternMatches(ok ++ broken) == Set((1L, 10L, 60L, 2L, 1L, 3L)))
  }

  test("patternRuns: non-overlapping repeated matches per user; funnel would count once") {
    val twice = Seq(
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "purchase", 30L, 3L),
      (1L, "view", 40L, 4L), (1L, "click", 50L, 5L), (1L, "purchase", 60L, 6L))
    assert(patternMatches(twice) ==
      Set((1L, 10L, 30L, 1L, 1L, 1L), (1L, 40L, 60L, 1L, 1L, 1L)))
  }

  test("patternRuns: equal timestamps break by event id; users are isolated") {
    // same ts everywhere: order is the event-id order V C P -> one match
    val tied = Seq((1L, "view", 10L, 1L), (1L, "click", 10L, 2L), (1L, "purchase", 10L, 3L))
    assert(patternMatches(tied) == Set((1L, 10L, 10L, 1L, 1L, 1L)))
    // flipping ids reverses the decoded order: P C V -> no match
    val flipped = Seq((1L, "view", 10L, 3L), (1L, "click", 10L, 2L), (1L, "purchase", 10L, 1L))
    assert(patternMatches(flipped).isEmpty)
    // a cross-user "continuation" must not stitch
    val split = Seq((1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (2L, "purchase", 30L, 3L))
    assert(patternMatches(split).isEmpty)
  }
}
