package org.apache.spark

/** Test-only access to `private[spark]` surfaces: listener-bus draining,
  * so a spec that accumulates task metrics through a SparkListener can
  * deterministically wait for every event to be delivered before it
  * asserts (the bus is async; without the drain a fast test would read a
  * partial sum). */
object GraftTestBridge {
  def waitUntilListenerEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
