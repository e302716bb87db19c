package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.TemporalJoins

/** Stream-stream semantics of [[TemporalJoins.intervalJoin]] over two
  * MemoryStreams: in-window pairs match, out-of-window pairs don't, and the
  * left-outer variant emits an unmatched left row (null right columns) only
  * after the right watermark proves no match can arrive. Watermark-based
  * join-state cleanup (not observable from a memory sink) is the documented
  * contract of putting the range condition on both event-time columns.
  */
case class IjClick(user: Long, clickTs: Timestamp, clickId: Long)
case class IjBuy(user: Long, buyTs: Timestamp, amount: Double)

class IntervalJoinStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("inner interval join matches only in-window same-key pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val clicks = MemoryStream[IjClick]
    val buys = MemoryStream[IjBuy]
    val joined = TemporalJoins.intervalJoin(
      clicks.toDF(), buys.toDF(), key = "user",
      leftTime = "clickTs", rightTime = "buyTs",
      lowerMs = 0L, upperMs = 30000L,
      watermarkDelay = Some("10 seconds"))
    val query = joined.writeStream.format("memory")
      .queryName("ij_inner").outputMode("append").start()
    try {
      clicks.addData(
        IjClick(1L, ts(100), 10L), // matched by buy at 120
        IjClick(1L, ts(200), 11L), // buy at 231 is 1s past the window
        IjClick(2L, ts(100), 12L)) // user 3's buy must not match user 2
      buys.addData(
        IjBuy(1L, ts(120), 5.0),
        IjBuy(1L, ts(231), 6.0),
        IjBuy(3L, ts(100), 7.0))
      query.processAllAvailable()
      val got = spark.table("ij_inner")
        .select("clickId", "amount").as[(Long, Double)].collect().toSet
      assert(got == Set((10L, 5.0)))
    } finally query.stop()
  }

  test("left-outer emits the unmatched left row only after the watermark closes its window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val clicks = MemoryStream[IjClick]
    val buys = MemoryStream[IjBuy]
    val joined = TemporalJoins.intervalJoin(
      clicks.toDF(), buys.toDF(), key = "user",
      leftTime = "clickTs", rightTime = "buyTs",
      lowerMs = 0L, upperMs = 30000L,
      watermarkDelay = Some("10 seconds"),
      joinType = "left_outer")
    val query = joined.writeStream.format("memory")
      .queryName("ij_outer").outputMode("append").start()
    try {
      clicks.addData(IjClick(1L, ts(100), 10L), IjClick(2L, ts(100), 20L))
      buys.addData(IjBuy(1L, ts(110), 5.0))
      query.processAllAvailable()
      // user 2's click window [100, 130] is still open (watermark ~100):
      // the null-padded row must NOT have been emitted yet
      val early = spark.table("ij_outer").select("clickId").as[Long].collect().toSet
      assert(early == Set(10L), s"outer row leaked before watermark: $early")

      // advance both watermarks far past 130 + 10s delay
      clicks.addData(IjClick(9L, ts(500), 99L))
      buys.addData(IjBuy(9L, ts(1000), 1.0))
      query.processAllAvailable()
      val rows = spark.table("ij_outer")
        .select("clickId", "amount").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toSet
      assert(rows.contains((20L, None)), s"unmatched left row missing: $rows")
      assert(rows.contains((10L, Some(5.0))))
    } finally query.stop()
  }

  test("batch execution: same operator, plain equi-join plan") {
    import spark.implicits._
    val clicks = Seq(IjClick(1L, ts(100), 10L), IjClick(1L, ts(200), 11L)).toDF()
    val buys = Seq(IjBuy(1L, ts(120), 5.0), IjBuy(1L, ts(260), 6.0)).toDF()
    val got = TemporalJoins.intervalJoin(
      clicks, buys, "user", "clickTs", "buyTs", 0L, 30000L)
      .select("clickId", "amount").as[(Long, Double)].collect().toSet
    assert(got == Set((10L, 5.0)))
    // negative lower bound: look-behind window [clickTs - 100s, clickTs]
    // picks up the buy PRECEDING click 11 (t=120 <= 200) and nothing for
    // click 10 (the only buys are after t=100)
    val behind = TemporalJoins.intervalJoin(
      clicks, buys, "user", "clickTs", "buyTs", -100000L, 0L)
      .select("clickId", "amount").as[(Long, Double)].collect().toSet
    assert(behind == Set((11L, 5.0)))
  }
}
