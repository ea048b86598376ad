package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Bench-only accessor: `SparkContext.listenerBus` is `private[spark]`, but the
  * bench harness needs to drain it before reading per-query CPU counters (stage
  * completion events are delivered asynchronously, so a counter read immediately
  * after an action can miss the final stages of that very action).
  */
object ListenerBusFlush {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
