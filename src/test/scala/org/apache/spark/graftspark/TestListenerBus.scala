package org.apache.spark.graftspark

import org.apache.spark.SparkContext

/** Test-only bridge into Spark's `private[spark]` listener bus, so
  * specs that assert on job-count windows (e.g. "constructing this
  * plan must run ZERO jobs") can drain the ASYNC bus deterministically
  * instead of `Thread.sleep`-ing and hoping: a fixed sleep both
  * false-fails (stale events from an earlier action arrive inside the
  * window on a backlogged bus) and false-passes (a real job's event
  * delivered late is never counted). `waitUntilEmpty` blocks until
  * every queued event has been delivered to every listener. */
object TestListenerBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
