package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; benchmarking needs to drain
  * it so task-metric deltas attribute to the right query. Same minimal-shim
  * pattern as org.apache.spark.sql.graft.ColumnBridge.
  */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
