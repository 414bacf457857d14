package org.apache.spark

/** Test-only shim into `SparkContext.listenerBus` (private[spark]), the
  * same minimal-bridge pattern as
  * [[org.apache.spark.sql.GraftColumnBridge]]: AqeFinalPlanSpec needs a
  * DETERMINISTIC flush of the async listener bus before unregistering its
  * QueryExecutionListener (ADVICE r13: fixed-interval polling can declare
  * "stable" while events are still queued, silently dropping internal
  * plans from the lint). `waitUntilEmpty` blocks until every posted event
  * has been delivered to every queue — or throws TimeoutException, which
  * fails the test loudly instead of passing incompletely. */
object GraftListenerBusShim {
  @throws[java.util.concurrent.TimeoutException]
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
