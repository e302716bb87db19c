package graft.ts

/** Daily trend helper — port of `_daily_trend_metrics`
  * (/root/reference/src/flinkarima.py:130-142).
  *
  * Over the last `days * seasonLen` raw samples: mean of the last season
  * (latest-day average) and mean of the whole trimmed slice (~five-day
  * average). Returns (None, None) on empty history.
  */
object DailyTrend {

  final case class Metrics(latestDayAvg: Option[Double], fiveDayAvg: Option[Double])

  def metrics(rawHistory: Seq[Double], seasonLen: Int, days: Int = 5): Metrics = {
    val season = math.max(1, seasonLen)
    val needed = season * math.max(1, days)
    if (rawHistory.isEmpty) return Metrics(None, None)
    val trimmed = if (rawHistory.length >= needed) rawHistory.takeRight(needed) else rawHistory
    val latestDay = if (trimmed.length >= season) trimmed.takeRight(season) else trimmed
    val latestAvg = if (latestDay.nonEmpty) Some(latestDay.sum / latestDay.length) else None
    val fiveAvg = if (trimmed.nonEmpty) Some(trimmed.sum / trimmed.length) else None
    Metrics(latestAvg, fiveAvg)
  }
}
