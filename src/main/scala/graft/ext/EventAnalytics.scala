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
    *
    * Shape: ONE linear plan. Each stage LEFT-joins the next step's events
    * and keeps a nullable earliest-completion time `t_j = min(ts WHERE
    * ts > t_{j-1})` (null `t_{j-1}` nulls the `when`, so drop-outs stay
    * dropped), then a single final aggregate counts non-null `t_j` per
    * step. Counting each stage with its own `.agg` on the chained frame
    * would re-execute stages 1..j for step j — O(k²) scans of the event
    * log (Spark does not reuse the common subplans across union branches);
    * here every stage executes exactly once and the log is scanned once
    * per step, each scan with its `event_type = step` filter pushed down.
    * Every stage groups by `uid` ALONE — the earlier completion times
    * `t_1..t_{j-1}` (constant per user after their stage) ride through as
    * `min` aggregates, so the shuffled key stays one column for a k-step
    * funnel instead of widening O(k).
    *
    * Null timestamps never enter or advance the funnel: `min(ts)` skips
    * nulls, so a step-1 user whose events all have null `ts` is not
    * counted in step 1 (consistent with later stages, where a null can
    * never satisfy `ts > t_{j-1}`).
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    def tCol(i: Int) = s"__t$i"
    var cur = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("uid"))
      .agg(min(col(tsCol)).as(tCol(1)))
    for ((step, j) <- steps.tail.zipWithIndex) {
      val i = j + 2 // stage index of `step` (1-based)
      val e = events
        .filter(col(typeCol) === step)
        .select(col(userCol).as("uid"), col(tsCol).as("__ts"))
      // prior stage times are constant per uid (each is the output of the
      // previous per-uid aggregate, duplicated by the join), so min() is
      // the identity carry — and the grouping key stays just `uid`
      val aggs = (1 until i).map(k => min(col(tCol(k))).as(tCol(k))) :+
        min(when(col("__ts") > col(tCol(i - 1)), col("__ts"))).as(tCol(i))
      cur = cur
        .join(e, Seq("uid"), "left")
        .groupBy(col("uid"))
        .agg(aggs.head, aggs.tail: _*)
    }
    val counts = cur.agg(
      count(col(tCol(1))).as("__n1"),
      (2 to steps.length).map(i => count(col(tCol(i))).as(s"__n$i")): _*)
    val stages = steps.zipWithIndex.map { case (step, j) =>
      struct(lit(j + 1).as("step"), lit(step).as("event_type"),
        col(s"__n${j + 1}").as("n_users"))
    }
    counts
      .select(explode(array(stages: _*)).as("s"))
      .select(col("s.step"), col("s.event_type"), col("s.n_users"))
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

  /** Per-key rolling statistics over an event-TIME range frame: for every
    * event, count/avg/min/max of `valueCol` over the key's events in
    * `[ts - windowMillis, ts]` (both bounds inclusive — the SQL-standard
    * `RANGE BETWEEN w PRECEDING AND CURRENT ROW`, identical peer-row
    * semantics in every engine, so timestamp ties cannot make the result
    * order-dependent). The lagging-context view an anomaly or drift
    * monitor reads per event — the per-event twin of the bucketed
    * [[graft.operators.WindowAgg]] aggregates.
    *
    * The average runs over exact decimal sums (the library-wide pattern),
    * so the whole row is engine-portable bitwise.
    *
    * Scale shape: ONE hash exchange on the key and a per-key sort — the
    * window never sorts globally (PlanShapeSpec pins it), and a key's
    * events sort within one task, the same per-stratum bound as
    * [[Sampling.quantileBuckets]] (for an unbounded hot key, the
    * streaming sliding-window aggregate is the tool instead).
    */
  def rollingStats(
      events: DataFrame,
      windowMillis: Long,
      keyCol: String = "user_id",
      tsMillisCol: String = "ts_ms",
      valueCol: String = "value"): DataFrame = {
    require(windowMillis >= 0, "need windowMillis >= 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsMillisCol))
      .rangeBetween(-windowMillis, 0)
    val n = count(lit(1)).over(w)
    val s1 = sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double")
    events.select(
      col(keyCol),
      col(tsMillisCol),
      col(valueCol),
      n.as("n_window"),
      (s1 / n).as("avg_window"),
      min(col(valueCol)).over(w).as("min_window"),
      max(col(valueCol)).over(w).as("max_window"))
  }

  /** First-order behavioral transition matrix: for each user's event
    * stream in time order, count `event_type → next event_type` pairs
    * and the per-source transition probability — the empirical Markov
    * chain funnels and sessionization summarize away. Ordering is
    * totalized by (ts, event_id); the probability is ONE IEEE division
    * of exact counts (count / source-total), bitwise portable. One
    * key-partitioned window + one aggregate — no self-join, no global
    * sort.
    */
  def transitionMatrix(events: DataFrame, keyCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val trans = events
      .filter(col(keyCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull && col(tieCol).isNotNull)
      .select(col(keyCol), col(typeCol).as("src"), col(tsCol), col(tieCol))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("src"))
    trans.select(col("src"), col("dst"), col("n"),
      (col("n").cast("double") / sum(col("n")).over(totals)).as("p"))
  }

  /** Robust outlier detection by median absolute deviation: per group,
    * `med = median(value)`, `mad = median(|value - med|)`, and a row is an
    * outlier when `|value - med| > k · 1.4826 · mad` (1.4826 is the
    * consistency constant making MAD estimate σ under normality). Unlike
    * the mean/stddev z-score (the reference's alert path), the breakdown
    * point is 50% — the contamination being hunted cannot drag the
    * threshold toward itself. Groups with `mad = 0` (over half the values
    * identical) yield no outliers: the robust z is undefined there, the
    * same degenerate guard as the reference's `std == 0` branch
    * (/root/reference/src/flinkarima.py alert math).
    *
    * Shape for 100 TB: two aggregation passes over the log (medians need
    * a second pass for the deviations) with TINY per-group stats frames
    * (one row per group) broadcast back — no window over the full log, no
    * global sort. Exact `percentile` keeps per-group values in executor
    * memory, which holds while group cardinality ≫ group count; at
    * per-group scales beyond that, the mergeable [[LogHistogram]] sketch
    * is the approximate path with the same merge-anywhere property.
    *
    * Both divisions/comparisons are single IEEE ops on identically-derived
    * doubles, so the DuckDB oracle replays bitwise (Spark `percentile` and
    * DuckDB `quantile_cont` share linear-interpolation arithmetic).
    */
  def madOutliers(
      events: DataFrame,
      k: Double = 3.0,
      typeCol: String = "event_type",
      valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    val base = events
      .filter(col(typeCol).isNotNull && col(valueCol).isNotNull)
      .select(col(idCol), col(typeCol), col(valueCol))
    val med = base.groupBy(col(typeCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = base.join(broadcast(med), Seq(typeCol))
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(col(typeCol))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq(typeCol))
      .filter(col("mad") > 0.0 && col("dev") > lit(k) * lit(1.4826) * col("mad"))
      .select(
        col(idCol),
        col(typeCol),
        col(valueCol),
        col("med"),
        col("mad"),
        ((col(valueCol) - col("med")) / (lit(1.4826) * col("mad"))).as("rob_z"))
  }

  /** SQL-2016 `MATCH_RECOGNIZE`-style row-pattern matching for the fixed
    * pattern `A+ B+ C+` over each user's time-ordered event stream —
    * complex-event processing that [[funnel]] cannot express: the funnel
    * asks "did steps happen in order, ever", this asks for CONTIGUOUS
    * runs (a `view+ click+ purchase+` match breaks if any other event
    * interleaves). Greedy `+` quantifiers over maximal runs and
    * non-overlapping matches — the MATCH_RECOGNIZE `AFTER MATCH SKIP
    * PAST LAST ROW` defaults — fall out for free: matches are triples of
    * CONSECUTIVE maximal runs, and maximal runs cannot overlap.
    *
    * Relational form (no state machine needed for a fixed pattern):
    * gaps-and-islands run detection (one per-user window pass), a run
    * roll-up, then the runs relation self-joined on consecutive run ids
    * with the type filter. Ordering ties break by `idCol` — pinned, so
    * the decode is deterministic on any engine.
    *
    * Output: (user, match start/end ts, per-step run lengths).
    *
    * Shape: ONE user-partitioned exchange carries the window, the run
    * roll-up (same clustering), and all three self-join sides; the runs
    * relation is one row per run, never per event.
    */
  def patternRuns(
      events: DataFrame,
      a: String, b: String, c: String,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy("u").orderBy(col("t"), col("eid"))
    val runs = events
      .filter(col(keyCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol).as("u"), col(typeCol).as("et"), col(tsCol).as("t"),
        col(idCol).as("eid"))
      .withColumn("brk",
        when(lag(col("et"), 1).over(ord) === col("et"), lit(0L)).otherwise(lit(1L)))
      .withColumn("run_id", sum(col("brk")).over(ord))
      .groupBy(col("u"), col("run_id"))
      .agg(first(col("et")).as("et"), min(col("t")).as("t0"),
        max(col("t")).as("t1"), count(lit(1)).as("len"))
    def side(n: Int, et: String) = runs.filter(col("et") === et)
      .select(col("u"), col("run_id").as(s"r$n"), col("t0").as(s"t0_$n"),
        col("t1").as(s"t1_$n"), col("len").as(s"len$n"))
    side(1, a)
      .join(side(2, b), Seq("u"))
      .join(side(3, c), Seq("u"))
      .filter(col("r2") === col("r1") + 1 && col("r3") === col("r2") + 1)
      .select(col("u").as(keyCol), col("t0_1").as("match_start"),
        col("t1_3").as("match_end"), col("len1").as("n_a"),
        col("len2").as("n_b"), col("len3").as("n_c"))
  }
}
