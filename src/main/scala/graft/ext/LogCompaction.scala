package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ======== Change-log compaction (MERGE-style upsert/delete apply) ========
  *
  * The table-maintenance primitive every lakehouse pipeline runs: given an
  * append-only change log where each record is an upsert or a delete of a
  * key, materialize the final table state — per key, the payload of the
  * LATEST record if it is an upsert, nothing if it is a delete.
  *
  * Shape for 100 TB: implemented as ONE hash aggregate
  * `max(struct(orderCols…, op, payload…))` per key, NOT a row_number
  * window. The difference matters at scale: a window must shuffle and
  * sort every log record; the aggregate's partial `max` combines
  * map-side, so each task ships at most one candidate row per key it saw
  * — on a log with high update churn (the normal case for CDC) that is
  * orders of magnitude less shuffle than the record count. Ordering is
  * totalized by the caller's `orderCols` (e.g. ts then a unique sequence
  * id), making the winner deterministic under any partitioning; struct
  * comparison is lexicographic by field position, which is exactly
  * "latest (ts, seq) wins".
  *
  * No reference citation — `/root/reference/src/flinkarima.py` has no
  * table-maintenance path; north-star lakehouse scope.
  */
object LogCompaction {

  /** Apply an upsert/delete log. `payloadCols` are carried through from
    * the winning record; records whose `opCol` equals `deleteOp` tombstone
    * the key. Null keys or null order fields are dropped up front (a
    * record that cannot be ordered cannot deterministically win).
    */
  def applyLog(
      log: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    val nonNull = (keyCols ++ orderCols).map(col(_).isNotNull).reduce(_ && _)
    val winner = struct((orderCols.map(col) :+ col(opCol).as("__op")) ++
      payloadCols.map(col): _*)
    log.filter(nonNull)
      .groupBy(keyCols.map(col): _*)
      .agg(max(winner).as("__w"))
      .filter(col("__w.__op") =!= deleteOp)
      .select(keyCols.map(col) ++
        orderCols.map(c => col(s"__w.$c").as(c)) ++
        payloadCols.map(c => col(s"__w.$c").as(c)): _*)
  }
}
