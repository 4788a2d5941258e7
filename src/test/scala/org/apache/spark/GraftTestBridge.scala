package org.apache.spark

/** Test-only bridge into `private[spark]` surface: lets specs drain
  * the async listener bus so "no job ran" assertions are race-free.
  * (Same pattern as the main-side GraftColumnBridge — a 5-line typed
  * door into an API Spark scopes to its own package.)
  */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
