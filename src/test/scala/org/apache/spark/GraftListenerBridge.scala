package org.apache.spark

/** Test-only bridge into the private[spark] listener bus: lets specs
  * that count asynchronously-delivered events (e.g. QueryExecution
  * successes) drain everything already queued BEFORE registering their
  * counting listener. Without the drain, an event from an earlier
  * action can still be in flight at registration time and be delivered
  * to the new listener — a timing flake under full-suite load. */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
