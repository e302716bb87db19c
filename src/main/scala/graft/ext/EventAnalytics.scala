package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event log (user_id, event_type, ts):
  * ordered funnels and cohort retention. Both are pure integer/count
  * computations — deterministic under any partitioning, and every
  * aggregation is a hash aggregate on a user or (cohort, offset) key, so
  * the shapes hold at 100 TB (shuffles carry one row per user per stage,
  * never per event, after the first aggregation).
  */
object EventAnalytics {

  /** Strictly-ordered funnel: a user reaches step k+1 only with an event of
    * that type STRICTLY LATER than their earliest completion of step k
    * (min-ts semantics; ties on the raw timestamp do not advance the
    * funnel). Output: one row per step — (step, event_type, n_users).
    *
    * `tsCol` should be the highest-resolution timestamp available (raw
    * int64 nanos here): comparing truncated timestamps would conflate
    * same-millisecond events across steps.
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    var cur = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("uid"))
      .agg(min(col(tsCol)).as("t"))
    val stages = Seq.newBuilder[(String, DataFrame)]
    stages += steps.head -> cur
    for (step <- steps.tail) {
      val e = events
        .filter(col(typeCol) === step)
        .select(col(userCol).as("uid"), col(tsCol).as("ts2"))
      cur = cur
        .join(e, "uid")
        .filter(col("ts2") > col("t"))
        .groupBy("uid")
        .agg(min(col("ts2")).as("t"))
      stages += step -> cur
    }
    stages.result().zipWithIndex.map { case ((step, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(step).as("event_type"), col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** Cohort retention: users are cohorted by the period of their first
    * event; for each (cohort, period offset) count the distinct users
    * active in that period. Periods are `floor(epoch_millis / periodMillis)`
    * — exact integer math (`tsCol` carries non-negative int64 nanos, so DIV
    * truncation == floor). Columns are parameterized like [[funnel]]'s, so
    * the operator runs on any event-log schema without a rename shim.
    */
  def cohortRetention(
      events: DataFrame,
      periodMillis: Long = 604800000L,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val period = expr(s"(`$tsCol` DIV 1000000) DIV $periodMillis")
    val activity = events
      .select(col(userCol).as("uid"), period.as("period"))
      .distinct()
    val firsts = activity.groupBy("uid").agg(min(col("period")).as("cohort"))
    activity
      .join(firsts, "uid")
      .select(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
