package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` core internals (same technique as
  * [[org.apache.spark.sql.graft.GraftSqlShim]] on the SQL side): the
  * listener bus is asynchronous, so a measurement harness that reads
  * listener-accumulated counters right after an action returns can race
  * late task-end events (r14 ADVICE #3 — ScaleGate's spill bytes could be
  * dropped or attributed to the NEXT query). `waitUntilEmpty` is the
  * sanctioned test-support drain; no internals are modified. */
object GraftCoreShim {
  /** Drain the listener bus, best-effort: a wedged bus must not turn a
    * measurement refinement into a harness hang, so time out quietly. */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
