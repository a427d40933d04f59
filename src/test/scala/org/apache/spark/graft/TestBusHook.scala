package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to the `private[spark]` listener bus: lets plan-audit
  * suites drain BOTH async listener queues deterministically instead of
  * sleep-polling for counter stability (round-5 ADVICE — the polling was
  * load-sensitive and a plausible CI flake under a slow bus).
  *
  * `listenerBus.waitUntilEmpty` covers SparkListener events; the
  * ExecutionListenerManager (QueryExecutionListener) is itself fed by a
  * bus-registered adapter, so one drain covers both once the triggering
  * actions have returned.
  */
object TestBusHook {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
