package graft.ts

import org.scalatest.funsuite.AnyFunSuite

/** Port-fidelity tests for `_daily_trend_metrics`
  * (/root/reference/src/flinkarima.py:130-142).
  */
class DailyTrendSpec extends AnyFunSuite {

  test("empty history -> (None, None) (flinkarima.py:133-134)") {
    assert(DailyTrend.metrics(Nil, 288) == DailyTrend.Metrics(None, None))
  }

  test("shorter than one season: both averages over the whole history") {
    val xs = Seq(1.0, 2.0, 3.0)
    val m = DailyTrend.metrics(xs, seasonLen = 288)
    assert(m.latestDayAvg.contains(2.0))
    assert(m.fiveDayAvg.contains(2.0))
  }

  test("exactly one season: latest == five-day (flinkarima.py:136-138)") {
    val xs = (1 to 288).map(_.toDouble)
    val m = DailyTrend.metrics(xs, 288)
    assert(m.latestDayAvg.contains(xs.sum / 288))
    assert(m.fiveDayAvg.contains(xs.sum / 288))
  }

  test("full window: latest day = last season; five-day = last days*season") {
    val s = 4
    val xs = (1 to 40).map(_.toDouble) // 10 seasons of length 4
    val m = DailyTrend.metrics(xs, s, days = 5)
    val last4 = xs.takeRight(4)
    val last20 = xs.takeRight(20)
    assert(m.latestDayAvg.contains(last4.sum / 4))
    assert(m.fiveDayAvg.contains(last20.sum / 20))
  }

  test("seasonLen 0 is guarded to 1") {
    val m = DailyTrend.metrics(Seq(5.0, 7.0), 0)
    assert(m.latestDayAvg.contains(7.0)) // season clamps to 1 -> last element
  }
}
