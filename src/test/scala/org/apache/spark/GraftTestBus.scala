package org.apache.spark

/** Test-only bridge into Spark's private[spark] listener bus: lets specs
  * flush pending listener events deterministically (no sentinel jobs, no
  * sleeps) before asserting on what a lazy operator did or didn't launch. */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
