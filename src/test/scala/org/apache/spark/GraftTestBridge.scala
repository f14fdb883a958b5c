package org.apache.spark

/** Test-only bridge into `private[spark]` surfaces: drains the listener
  * bus so specs can make deterministic assertions about scheduled jobs
  * (no sleeps). */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
