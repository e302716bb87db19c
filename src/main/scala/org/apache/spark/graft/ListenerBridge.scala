package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; benchmarking needs to drain
  * it so task-metric deltas attribute to the right query. Same minimal-shim
  * pattern as org.apache.spark.sql.graft.ColumnBridge.
  */
object ListenerBridge {
  /** Returns false (rather than throwing) if the bus is still busy after
    * the timeout — a benchmark must never die mid-run over a slow drain;
    * the metric delta is merely slightly misattributed.
    */
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
