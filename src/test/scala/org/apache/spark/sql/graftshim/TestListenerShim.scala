package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/** Test-only accessor for the private[spark] listener bus: lets specs
  * flush async SparkListener events (task metrics) before asserting.
  */
object TestListenerShim {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
