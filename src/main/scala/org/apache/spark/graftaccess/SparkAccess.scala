package org.apache.spark.graftaccess

import org.apache.spark.SparkContext

/** The one `private[spark]` seam this library reaches through: draining
  * the listener bus. Shuffle-byte receipts (graft.ShuffleReceipt) total
  * task metrics from a SparkListener, and listener delivery is
  * asynchronous — reading the tally right after an action returns races
  * the bus and silently undercounts. `LiveListenerBus.waitUntilEmpty()`
  * is the exact public-in-bytecode, package-private-in-Scala barrier
  * Spark's own test suites use for this; this object lives under
  * `org.apache.spark` solely to call it. No other internals are touched.
  */
object SparkAccess {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
