package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus: metric-fenced tools
  * (graft.tools.ShuffleProfile) must drain the ASYNC bus between
  * queries or task metrics posted late would be attributed to the next
  * query's window.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
