package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`,
  * but listener-based bounded-work assertions need to drain in-flight
  * events before reading their counters.
  */
object TestListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
