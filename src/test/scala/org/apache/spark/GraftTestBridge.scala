package org.apache.spark

/** Test-only bridge to `private[spark]` internals: deterministic
  * listener-bus draining for specs that measure task metrics (a
  * listener registered mid-stream can otherwise receive still-queued
  * TaskEnd events from earlier jobs and pollute its measurement).
  */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
